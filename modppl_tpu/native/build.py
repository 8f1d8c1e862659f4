"""Build the native extension in-place: ``python -m modppl_tpu.native.build``."""

import os
import subprocess
import sys
import sysconfig


def build():
    here = os.path.dirname(os.path.abspath(__file__))
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX")
    include = sysconfig.get_path("include")
    cc = os.environ.get("CC", "gcc")
    outs = []
    for name in ("addrops", "ctrie"):
        src = os.path.join(here, name + ".c")
        out = os.path.join(here, "_" + name + ext_suffix)
        cmd = [cc, "-O2", "-fPIC", "-shared", f"-I{include}", src, "-o", out]
        subprocess.run(cmd, check=True)
        outs.append(out)
    return outs


if __name__ == "__main__":
    for path in build():
        sys.stderr.write(f"built {path}\n")
