"""Build hook: pip install drives `make` for the native runtime.

Parity with the reference's setup.py (/root/reference/setup.py:10-25), which
hijacks build_ext to shell out to its Makefile.  The native library is
optional (NumPy fallback), so a missing toolchain degrades to a warning
instead of failing the install.
"""

import pathlib
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_ext import build_ext


class MakeExt(build_ext):
    def run(self):
        root = pathlib.Path(__file__).resolve().parent
        try:
            subprocess.run(["make"], cwd=root, check=True)
        except (OSError, subprocess.CalledProcessError) as exc:
            print(f"warning: native dataloader build skipped ({exc}); "
                  "the NumPy fallback will be used")
            return
        built = root / "build" / "libfat_dataloader.so"
        if built.exists():
            dest = (
                pathlib.Path(self.build_lib)
                / "flash_attention_tpu"
                / "data"
                / "libfat_dataloader.so"
            )
            dest.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(built, dest)


setup(cmdclass={"build_ext": MakeExt}, has_ext_modules=lambda: True)
