"""Build hook only — all metadata lives in pyproject.toml.

Compiles the native C++ JPEG/letterbox loader (native/loader.cc) during
``build_py`` and ships it as package data
(yolov3_tensorflow_tpu/data/libyolo_loader.so).  Build failure (no
toolchain / no libjpeg headers) is non-fatal: the wheel is then
pure-Python and data/native_loader.py falls back to PIL at runtime."""
import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

HERE = os.path.abspath(os.path.dirname(__file__))
NATIVE_DIR = os.path.join(HERE, "native")
SO = os.path.join(NATIVE_DIR, "libyolo_loader.so")


class BuildPyWithNative(build_py):
    def run(self):
        try:
            subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                           timeout=300)
        except Exception as e:  # toolchain/libjpeg absent
            print(f"native loader build skipped ({type(e).__name__}: {e}); "
                  "wheel will use the PIL fallback")
        super().run()
        if os.path.exists(SO):
            dst = os.path.join(self.build_lib, "yolov3_tensorflow_tpu",
                               "data", "libyolo_loader.so")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(SO, dst)


setup(cmdclass={"build_py": BuildPyWithNative})
