"""ctypes binding for the native C++ runtime (libsurtr_native.so).

Build with ``make native`` at the repo root. All callers fall back to pure
Python when the library is absent — the native path is a performance
equivalent, not a hard dependency (DESIGN.md 'Native runtime')."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    for cand in (
        os.path.join(here, "libsurtr_native.so"),
        os.path.join(here, "..", "..", "build", "libsurtr_native.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.obj_parse.restype = ctypes.c_void_p
                lib.obj_parse.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int,
                ]
                lib.obj_counts.argtypes = [
                    ctypes.c_void_p,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.obj_copy.argtypes = [
                    ctypes.c_void_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.obj_free.argtypes = [ctypes.c_void_p]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


class obj_native:
    """Namespace mirroring surtr_tpu.io.obj's loader signature."""

    @staticmethod
    def parse_obj_file(path, scale=(1, 1, 1), offset=(0, 0, 0), mirror_x=True):
        lib = _load()
        if lib is None:
            return None
        sc = (ctypes.c_float * 3)(*[float(s) for s in scale])
        of = (ctypes.c_float * 3)(*[float(o) for o in offset])
        h = lib.obj_parse(path.encode(), sc, of, 1 if mirror_x else 0)
        if not h:
            return None
        try:
            nv, nt = ctypes.c_int(), ctypes.c_int()
            lib.obj_counts(h, ctypes.byref(nv), ctypes.byref(nt))
            verts = np.empty((nv.value, 3), np.float32)
            tris = np.empty((nt.value, 3), np.int32)
            lib.obj_copy(
                h,
                verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            )
            return verts, tris
        finally:
            lib.obj_free(h)


def available() -> bool:
    return _load() is not None
