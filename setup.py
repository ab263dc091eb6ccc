"""Build the C++ data-loading runtime into the wheel.

The loader (csrc/pointloader.cpp) is a plain-C ABI consumed via ctypes
(fullysparsefusion_tpu/data/native.py) — there is no CPython API in it, so
we build it as an ordinary shared library placed inside the package
directory. ``pip wheel .`` / ``pip install .`` therefore ship a working
native fast path; the Makefile (``make -C csrc``) remains the in-repo dev
build and is still honoured as a fallback search location.
"""
from setuptools import setup, Extension
from setuptools.command.build_ext import build_ext


class CtypesExtension(Extension):
    pass


class build_ctypes_ext(build_ext):
    def get_export_symbols(self, ext):
        if isinstance(ext, CtypesExtension):
            return ext.export_symbols  # no PyInit_* requirement
        return super().get_export_symbols(ext)

    def get_ext_filename(self, ext_name):
        # plain libfsfloader.so, no cpython ABI tag — ctypes loads by name
        if ext_name.endswith("libfsfloader"):
            head = ext_name.rpartition(".")[0].replace(".", "/")
            return (head + "/" if head else "") + "libfsfloader.so"
        return super().get_ext_filename(ext_name)


setup(
    ext_modules=[
        CtypesExtension(
            "fullysparsefusion_tpu.libfsfloader",
            sources=["csrc/pointloader.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-fPIC", "-Wall"],
            extra_link_args=["-pthread"],
        )
    ],
    cmdclass={"build_ext": build_ctypes_ext},
)
