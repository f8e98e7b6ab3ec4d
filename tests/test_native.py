"""Native C++ DICOM reader tests: build via g++, parse hand-crafted files
covering the full CHAOS file profile (explicit + implicit VR LE,
8/16-bit, 12-bit-in-16, signed pixels, RescaleSlope/Intercept)."""

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


def _el_implicit(group, elem, value):
    return struct.pack("<HHI", group, elem, len(value)) + value


def _ds(text):
    b = text.encode()
    return b + b" " if len(b) % 2 else b


def make_dicom(
    path,
    rows=3,
    cols=4,
    spacing=(1.5, 2.0),
    bits=16,
    signed=False,
    implicit=False,
    bits_stored=None,
    high_bit=None,
    rescale=None,
    pixels=None,
    slice_spacing=7.7,
):
    """Craft a Part-10 DICOM; returns the EXPECTED decoded float image
    (after bit extraction, sign extension and modality rescale)."""
    if pixels is None:
        pixels = np.arange(rows * cols, dtype=np.uint16)
    raw = np.asarray(pixels, dtype=np.uint16).ravel()

    def el(group, elem, vr, value):
        if implicit:
            return _el_implicit(group, elem, value)
        return _el_short(group, elem, vr, value)

    body = b""
    body += el(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += el(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += el(0x0028, 0x0030, b"DS", _ds("%g\\%g" % spacing))
    body += el(0x0018, 0x0088, b"DS", _ds("%g" % slice_spacing))
    body += el(0x0028, 0x0100, b"US", struct.pack("<H", bits))
    body += el(0x0028, 0x0103, b"US", struct.pack("<H", 1 if signed else 0))
    if bits_stored is not None:
        body += el(0x0028, 0x0101, b"US", struct.pack("<H", bits_stored))
    if high_bit is not None:
        body += el(0x0028, 0x0102, b"US", struct.pack("<H", high_bit))
    if rescale is not None:
        slope, intercept = rescale
        body += el(0x0028, 0x1053, b"DS", _ds("%g" % slope))
        body += el(0x0028, 0x1052, b"DS", _ds("%g" % intercept))
    if bits == 16:
        pix = raw.tobytes()
    else:
        pix = raw.astype(np.uint8).tobytes()
    if implicit:
        body += _el_implicit(0x7FE0, 0x0010, pix)
    else:
        body += _el_long(0x7FE0, 0x0010, b"OW", pix)
    # file meta group is always explicit VR, even in implicit-VR files
    meta = _el_short(
        0x0002,
        0x0010,
        b"UI",
        b"1.2.840.10008.1.2\x00" if implicit else b"1.2.840.10008.1.2.1\x00",
    )
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)

    # expected decode
    bs = bits_stored or bits
    hb = high_bit if high_bit is not None else bs - 1
    v = raw.astype(np.int64)
    if bs < bits or hb != bs - 1:
        v = (v >> (hb + 1 - bs)) & ((1 << bs) - 1)
    if signed:
        sign = 1 << (bs - 1)
        v = np.where(v >= sign, v - (1 << bs), v)
    out = v.astype(np.float32)
    if rescale is not None:
        out = out * rescale[0] + rescale[1]
    return out.reshape(rows, cols)


class TestNativeDicom:
    def test_read_explicit_vr(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        p = str(tmp_path / "a.dcm")
        expected = make_dicom(p)
        d = NativeDicom(p)
        assert d.image.shape == (3, 4)
        np.testing.assert_allclose(d.image, expected)
        np.testing.assert_allclose(d.resolution, (1.5, 2.0, 7.7))

    def test_read_implicit_vr(self, tmp_path):
        """Real CHAOS files are implicit VR LE (1.2.840.10008.1.2) with an
        explicit-VR file-meta group."""
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        p = str(tmp_path / "imp.dcm")
        expected = make_dicom(p, rows=5, cols=6, implicit=True)
        d = NativeDicom(p)
        assert d.image.shape == (5, 6)
        np.testing.assert_allclose(d.image, expected)
        np.testing.assert_allclose(d.resolution, (1.5, 2.0, 7.7))

    def test_read_8bit(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        p = str(tmp_path / "b.dcm")
        expected = make_dicom(p, rows=2, cols=2, bits=8)
        d = NativeDicom(p)
        np.testing.assert_allclose(d.image, expected)

    def test_12bit_in_16_with_overlay_bits(self, tmp_path):
        """BitsStored=12/HighBit=11: upper nibble (legacy overlay bits)
        must be masked off."""
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        vals = np.array([0, 1, 4095, 0xF000 | 7], dtype=np.uint16)
        p = str(tmp_path / "t12.dcm")
        expected = make_dicom(
            p, rows=2, cols=2, bits=16, bits_stored=12, high_bit=11,
            pixels=vals,
        )
        d = NativeDicom(p)
        np.testing.assert_allclose(d.image, expected)
        assert d.image.max() == 4095.0
        assert d.image[1, 1] == 7.0  # overlay bits stripped

    def test_rescale_slope_intercept(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        p = str(tmp_path / "rs.dcm")
        expected = make_dicom(p, rescale=(2.5, -100.0))
        d = NativeDicom(p)
        np.testing.assert_allclose(d.image, expected)
        assert d.image.min() == -100.0

    def test_signed_pixels_sign_extended(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        # 12-bit signed: 4095 is -1, 2048 is -2048
        vals = np.array([0, 1, 4095, 2048], dtype=np.uint16)
        p = str(tmp_path / "c.dcm")
        expected = make_dicom(
            p, rows=2, cols=2, signed=True, bits_stored=12, high_bit=11,
            pixels=vals,
        )
        d = NativeDicom(p)
        np.testing.assert_allclose(d.image, expected)
        np.testing.assert_allclose(
            d.image.ravel(), [0.0, 1.0, -1.0, -2048.0]
        )

    def test_implicit_vr_12bit_rescale_combo(self, tmp_path):
        """The full real-file profile at once: implicit VR + 12-in-16 +
        modality rescale."""
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        vals = (np.arange(12, dtype=np.uint16) * 300) % 4096
        p = str(tmp_path / "full.dcm")
        expected = make_dicom(
            p, rows=3, cols=4, implicit=True, bits_stored=12, high_bit=11,
            rescale=(1.5, 10.0), pixels=vals,
        )
        d = NativeDicom(p)
        np.testing.assert_allclose(d.image, expected)

    def test_missing_file_raises(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import NativeDicom

        with pytest.raises(IOError):
            NativeDicom(str(tmp_path / "nope.dcm"))

    def test_read_dicom_fallback_entry(self, tmp_path):
        from multimodal_segmentation_tpu.data.dicom_native import read_dicom

        p = str(tmp_path / "d.dcm")
        expected = make_dicom(p)
        d = read_dicom(p)
        np.testing.assert_allclose(d.image, expected)
