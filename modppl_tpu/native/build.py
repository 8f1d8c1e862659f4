"""Build the native extension in-place: ``python -m modppl_tpu.native.build``."""

import os
import subprocess
import sys
import sysconfig


def build():
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "addrops.c")
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(here, "_addrops" + ext_suffix)
    include = sysconfig.get_path("include")
    cc = os.environ.get("CC", "gcc")
    cmd = [cc, "-O2", "-fPIC", "-shared", f"-I{include}", src, "-o", out]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    sys.stderr.write(f"built {path}\n")
