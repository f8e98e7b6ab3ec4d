"""End-to-end real-CHAOS ingest: a fabricated CHAOS directory tree
(T1DUAL/DICOM_anon/OutPhase + T2SPIR/DICOM_anon + Ground PNGs, implicit-VR
12-bit DICOMs with modality rescale — the real file profile) walked through
ChaosLoader to a 192x192 paired batch (reference loaders/chaos.py:276-321).
"""

import os
import shutil

import numpy as np
import pytest

from tests.test_native import make_dicom

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ not available (native reader)"
)

ROWS, COLS = 100, 110
SPACING = (2.0, 2.0)  # exercises the 1.89mm in-plane resample


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8)).save(path)


def _make_volume(root, volume, modality, n_slices, seed):
    """One modality of one fabricated CHAOS volume: DICOM slices named and
    sorted like the real archive + Ground PNGs with organ values
    63/126/189/252."""
    if modality == "t1":
        folder = os.path.join(root, str(volume), "T1DUAL")
        img_dir = os.path.join(folder, "DICOM_anon", "OutPhase")
        # real archives also have an InPhase sibling the loader must ignore
        os.makedirs(os.path.join(folder, "DICOM_anon", "InPhase"), exist_ok=True)
    else:
        folder = os.path.join(root, str(volume), "T2SPIR")
        img_dir = os.path.join(folder, "DICOM_anon")
    gt_dir = os.path.join(folder, "Ground")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)

    r = np.random.RandomState(seed)
    for i in range(n_slices):
        pixels = (r.rand(ROWS, COLS) * 4000).astype(np.uint16)
        make_dicom(
            os.path.join(img_dir, "IMG-0004-%05d.dcm" % (i + 1)),
            rows=ROWS,
            cols=COLS,
            spacing=SPACING,
            implicit=True,
            bits_stored=12,
            high_bit=11,
            rescale=(1.0, -1024.0),
            pixels=pixels,
        )
        gt = np.zeros((ROWS, COLS), np.uint8)
        gt[10:40, 10:50] = 63    # liver
        gt[50:70, 10:30] = 126   # right kidney
        gt[50:70, 60:80] = 189   # left kidney
        gt[20:40, 70:100] = 252  # spleen
        _write_png(os.path.join(gt_dir, "IMG-0004-%05d.png" % (i + 1)), gt)


@pytest.fixture(scope="module")
def chaos_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("chaos_mr"))
    # volumes with simple alignment ops: 15 -> t1[:22]/t2[:22],
    # 20 -> t1[2:21]/t2[2:21]
    for vol, n1, n2, seed in ((15, 24, 23, 0), (20, 24, 24, 1)):
        _make_volume(root, vol, "t1", n1, seed)
        _make_volume(root, vol, "t2", n2, seed + 100)
    return root


def _loader(root, tmp_cache):
    from multimodal_segmentation_tpu.data.chaos import ChaosLoader

    class TinyChaos(ChaosLoader):
        def splits(self):
            return [{"training": [15, 20], "validation": [15], "test": [20]}]

    return TinyChaos(data_folder=root, cache_dir=tmp_cache)


class TestChaosIngest:
    def test_tree_to_paired_batch(self, chaos_tree, tmp_path):
        loader = _loader(chaos_tree, str(tmp_path / "cache"))
        assert loader.available()
        data = loader.load_all_modalities_concatenated(0, "training")

        # alignment: vol 15 -> min(22, 22) = 22 pairs; vol 20 -> 19
        assert data.size() == 22 + 19
        i1 = data.get_images_modi(0)
        i2 = data.get_images_modi(1)
        m1 = data.get_masks_modi(0)
        assert i1.shape == (41, 192, 192, 1)
        assert i2.shape == (41, 192, 192, 1)
        assert m1.shape == (41, 192, 192, 4)
        # per-slice [-1,1] rescale (chaos.py:242-243)
        assert i1.min() >= -1.0 and i1.max() <= 1.0
        np.testing.assert_allclose(i1.reshape(41, -1).min(axis=1), -1.0)
        np.testing.assert_allclose(i1.reshape(41, -1).max(axis=1), 1.0)
        # masks binarised from greyscale 63/126/189/252 and disjoint
        assert set(np.unique(m1)) <= {0.0, 1.0}
        assert m1.sum(-1).max() <= 1.0
        # all four organs present after resample + crop
        assert (m1.sum(axis=(0, 1, 2)) > 0).all()
        # volume index carried through
        assert set(np.unique(data.index)) == {15, 20}

    def test_cache_roundtrip_identical(self, chaos_tree, tmp_path):
        cache = str(tmp_path / "cache2")
        a = _loader(chaos_tree, cache).load_all_modalities_concatenated(
            0, "validation"
        )
        # second load comes from the npz cache
        b = _loader(chaos_tree, cache).load_all_modalities_concatenated(
            0, "validation"
        )
        np.testing.assert_array_equal(
            a.get_images_modi(0), b.get_images_modi(0)
        )
        np.testing.assert_array_equal(a.get_masks_modi(1), b.get_masks_modi(1))

    @pytest.mark.slow
    def test_all20_fabricated_tree_pair_counts(self, tmp_path):
        """Full 20-volume rehearsal tree (reference-scale raw slice counts,
        tools/dress_rehearsal.py) through the REAL ChaosLoader: per-volume
        aligned pair counts must equal the hand-derived reference table
        (tests/test_chaos_alignment_lock.py) for every volume — the
        assertion a real-CHAOS mount will be validated with (VERDICT r4
        item 6)."""
        from tools.dress_rehearsal import ALL_VOLUMES, RAW_COUNTS, fabricate_tree
        from tests.test_chaos_alignment_lock import FIXED_COUNTS, OPEN_FORMS
        from multimodal_segmentation_tpu.data.chaos import ChaosLoader

        root = str(tmp_path / "MR")
        fabricate_tree(root)
        loader = ChaosLoader(data_folder=root, cache_dir=str(tmp_path / "cache"))
        assert loader.available()

        counts = {}
        for split_type in ("training", "validation", "test"):
            data = loader.load_all_modalities_concatenated(0, split_type)
            idx = np.asarray(data.index)
            for v in np.unique(idx):
                counts[int(v)] = int((idx == v).sum())

        assert sorted(counts) == sorted(ALL_VOLUMES)
        for v in ALL_VOLUMES:
            if v in FIXED_COUNTS:
                expect = FIXED_COUNTS[v][0]
            else:
                expect = OPEN_FORMS[v](*RAW_COUNTS[v])
            assert counts[v] == expect, (
                f"vol {v}: loader produced {counts[v]} pairs, "
                f"reference slicing gives {expect}"
            )

    def test_executor_trains_on_fabricated_chaos(self, chaos_tree, tmp_path):
        """The full framework path: MMSEG_TPU_CHAOS_DIR-style folder ->
        loader -> one fused DAFNet step."""
        import jax

        from multimodal_segmentation_tpu.config import tiny_test_config
        from multimodal_segmentation_tpu.models import build_model
        from multimodal_segmentation_tpu.train.executor import make_executor

        conf = tiny_test_config("dafnet")
        conf.epochs = 1
        conf.steps_per_epoch = 1
        conf.folder = str(tmp_path / "chaos_e2e")
        model = build_model(conf)
        ex = make_executor(conf, model)
        ex.loader = _loader(chaos_tree, str(tmp_path / "cache3"))
        ex.loader.modalities = list(conf.modality)
        ts = ex.train()
        assert int(ts.step) >= 1
