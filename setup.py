"""Build hook for the OPTIONAL native audio-I/O runtime.

cpp/audioio.cpp exports a plain C ABI (loaded via ctypes, no Python C API),
so it compiles as a normal setuptools Extension placed inside the package
(`audio_analysis_tpu/_audioio*.so`); io.native scans for it alongside the
repo-local `cpp/build/libaudioio.so`. `optional=True` keeps pure-Python
installs working on hosts without a C++17 toolchain.

All real metadata lives in pyproject.toml.
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "audio_analysis_tpu._audioio",
            sources=["cpp/audioio.cpp"],
            language="c++",
            extra_compile_args=["-std=c++17", "-O2", "-Wall"],
            extra_link_args=["-lpthread"],
            optional=True,
        )
    ]
)
