"""Native C++ DICOM reader tests: build via g++, parse hand-crafted files."""

import os
import shutil
import struct

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ not available"
)


def _el_short(group, elem, vr, value):
    return struct.pack("<HH2sH", group, elem, vr, len(value)) + value


def _el_long(group, elem, vr, value):
    return struct.pack("<HH2sHI", group, elem, vr, 0, len(value)) + value


def make_dicom(path, rows=3, cols=4, spacing=(1.5, 2.0), bits=16, signed=False):
    pixels = np.arange(rows * cols, dtype=np.uint16 if not signed else np.int16)
    body = b""
    # file meta (explicit VR)
    body += _el_short(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.1\x00")
    body += _el_short(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += _el_short(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    ds = ("%g\\%g" % spacing).encode()
    if len(ds) % 2:
        ds += b" "
    body += _el_short(0x0028, 0x0030, b"DS", ds)
    body += _el_short(0x0018, 0x0088, b"DS", b"7.70")
    body += _el_short(0x0028, 0x0100, b"US", struct.pack("<H", bits))
    body += _el_short(0x0028, 0x0103, b"US", struct.pack("<H", 1 if signed else 0))
    if bits == 16:
        pix = pixels.tobytes()
    else:
        pix = pixels.astype(np.uint8).tobytes()
    body += _el_long(0x7FE0, 0x0010, b"OW", pix)
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + body)
    return pixels.reshape(rows, cols)


class TestNativeDicom:
    def test_read_explicit_vr(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        p = str(tmp_path / "a.dcm")
        expected = make_dicom(p)
        d = NativeDicom(p)
        assert d.image.shape == (3, 4)
        np.testing.assert_allclose(d.image, expected.astype(np.float32))
        np.testing.assert_allclose(d.resolution, (1.5, 2.0, 7.7))

    def test_read_8bit(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        p = str(tmp_path / "b.dcm")
        expected = make_dicom(p, rows=2, cols=2, bits=8)
        d = NativeDicom(p)
        np.testing.assert_allclose(d.image, expected.astype(np.float32))

    def test_signed_pixels(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        p = str(tmp_path / "c.dcm")
        make_dicom(p, signed=True)
        d = NativeDicom(p)
        assert d.image.dtype == np.float32

    def test_missing_file_raises(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        with pytest.raises(IOError):
            NativeDicom(str(tmp_path / "nope.dcm"))

    def test_read_dicom_fallback_entry(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import read_dicom

        p = str(tmp_path / "d.dcm")
        expected = make_dicom(p)
        d = read_dicom(p)
        np.testing.assert_allclose(d.image, expected.astype(np.float32))
