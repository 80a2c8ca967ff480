"""Build hook: compile the native decoder into the wheel.

The reference installs as a system library with packaging
(reference: CMakeLists.txt:96-110, python/setup.py); here `pip install .`
produces a package whose native decoder (bliss_tpu/io/_native) is compiled
during the build when the libav dev toolchain is present, and otherwise
builds itself on first import (bliss_tpu/io/decoder.py keeps that runtime
path for source checkouts and toolchain-less wheels — falling back to a
user-cache build when the installed package directory is read-only).
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        super().run()
        native = os.path.join(self.build_lib, "bliss_tpu", "io", "_native")
        try:
            try:
                subprocess.run(
                    ["make", "-C", native], check=True, capture_output=True
                )
            except FileNotFoundError:  # no make (Windows): cmake fallback
                build = os.path.join(native, "build")
                subprocess.run(
                    ["cmake", "-S", native, "-B", build],
                    check=True,
                    capture_output=True,
                )
                subprocess.run(
                    ["cmake", "--build", build, "--config", "Release"],
                    check=True,
                    capture_output=True,
                )
            print("built native decoder into the wheel")
        except Exception as e:  # noqa: BLE001 — degrade to runtime build
            print(
                f"native decoder not prebuilt ({e}); it will build on first "
                "import (requires g++, make, pkg-config, libav dev packages)"
            )


setup(cmdclass={"build_py": build_py_with_native})
