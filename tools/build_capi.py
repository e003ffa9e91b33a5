#!/usr/bin/env python
"""Build libsvtav1_tpu.so — the public C API library (native/capi.h).

Links the embedded-CPython shim (native/capi_backend.c) against the
running interpreter's libpython; rebuilds on content change like
native.py does for libtpuec.so.
"""
import hashlib
import pathlib
import subprocess
import sys
import sysconfig

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "native" / "capi_backend.c"
HDR = ROOT / "native" / "capi.h"
OUT = ROOT / "native" / "libsvtav1_tpu.so"
STAMP = ROOT / "native" / ".capi.stamp"


def build(force: bool = False) -> pathlib.Path:
    digest = hashlib.sha256(SRC.read_bytes() + HDR.read_bytes()
                            ).hexdigest()
    if not force and OUT.exists() and STAMP.exists() and \
            STAMP.read_text() == digest:
        return OUT
    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR")
    ver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    cmd = ["cc", "-O2", "-shared", "-fPIC", str(SRC), "-o", str(OUT),
           f"-I{inc}", f"-I{ROOT / 'native'}",
           f"-L{libdir}", f"-l{ver}", f"-Wl,-rpath,{libdir}"]
    subprocess.run(cmd, check=True)
    STAMP.write_text(digest)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
