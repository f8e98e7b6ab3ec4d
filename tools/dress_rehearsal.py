"""Real-CHAOS dress rehearsal: fabricate a 20-volume real-scale DICOM tree
and run the production CLI against it end-to-end.

The moment a real CHAOS dataset mounts, only MMSEG_TPU_CHAOS_DIR changes —
this tool proves every step downstream of the filesystem (DICOM decode via
the native reader, 1.89 mm resample, curated alignment, [-1,1] rescale,
192^2 crop, split assembly, the full training + tester protocol) on a tree
with the real archive's file profile: per-volume slice counts at realistic
CHAOS scale, 256x288 12-bit-in-16 implicit-VR DICOMs with modality rescale,
Ground PNGs at organ values 63/126/189/252.

Reference pipeline being rehearsed: loaders/chaos.py:276-343 (decode +
resample), :110-240 (alignment), experiment.py (CLI + artifacts),
model_executors/dafnet_executor.py (training), model_tester.py (testing).

Usage:
  python tools/dress_rehearsal.py [--epochs 2] [--root DIR] [--keep]
      [--skip-train] [--bf16]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

ALL_VOLUMES = [1, 2, 3, 5, 8, 10, 13, 15, 19, 20, 21, 22, 31, 32, 33, 34, 36, 37, 38, 39]

# Realistic raw slice counts (CHAOS MR volumes run ~26-50 slices),
# satisfying every threshold in tests/test_chaos_alignment_lock.py so the
# aligned pair counts land on the locked values.
RAW_COUNTS = {
    1: (30, 29), 2: (27, 26), 3: (30, 27), 5: (28, 26), 8: (35, 31),
    10: (42, 28), 13: (33, 32), 15: (26, 26), 19: (31, 28), 20: (25, 25),
    21: (23, 25), 22: (32, 27), 31: (27, 26), 32: (36, 34), 33: (34, 30),
    34: (31, 25), 36: (29, 26), 37: (36, 34), 38: (28, 28), 39: (26, 26),
}

ROWS, COLS = 256, 288           # off-square: exercises resample + crop/pad
SPACING = (1.6, 1.6)            # CHAOS-like in-plane resolution (mm)


def _organ_gt(rows, cols, slice_frac):
    """Ground PNG with 4 organ blobs whose positions drift slowly through
    the volume (aligned T1/T2 slices therefore correlate anatomically)."""
    gt = np.zeros((rows, cols), np.uint8)
    dy = int(20 * slice_frac)
    gt[40 + dy:110 + dy, 40:140] = 63     # liver
    gt[130 + dy:170 + dy, 40:90] = 126    # right kidney
    gt[130 + dy:170 + dy, 150:200] = 189  # left kidney
    gt[50 + dy:100 + dy, 190:250] = 252   # spleen
    return gt


def fabricate_tree(root):
    from tests.test_native import make_dicom

    t0 = time.time()
    for v in ALL_VOLUMES:
        n1, n2 = RAW_COUNTS[v]
        for modality, n in (("t1", n1), ("t2", n2)):
            if modality == "t1":
                folder = os.path.join(root, str(v), "T1DUAL")
                img_dir = os.path.join(folder, "DICOM_anon", "OutPhase")
                os.makedirs(os.path.join(folder, "DICOM_anon", "InPhase"),
                            exist_ok=True)
            else:
                folder = os.path.join(root, str(v), "T2SPIR")
                img_dir = os.path.join(folder, "DICOM_anon")
            gt_dir = os.path.join(folder, "Ground")
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(gt_dir, exist_ok=True)
            r = np.random.RandomState(1000 * v + (0 if modality == "t1" else 1))
            for i in range(n):
                # smooth anatomy-ish pattern + noise, 12-bit range
                yy, xx = np.mgrid[0:ROWS, 0:COLS]
                base = 1800 + 1200 * np.sin(yy / 37.0 + v) * np.cos(xx / 29.0 + i / 7.0)
                pixels = np.clip(base + r.rand(ROWS, COLS) * 400, 0, 4095).astype(np.uint16)
                make_dicom(
                    os.path.join(img_dir, "IMG-0004-%05d.dcm" % (i + 1)),
                    rows=ROWS, cols=COLS, spacing=SPACING,
                    implicit=True, bits_stored=12, high_bit=11,
                    rescale=(1.0, -1024.0), pixels=pixels,
                )
                from PIL import Image

                gt = _organ_gt(ROWS, COLS, i / max(1, n - 1))
                Image.fromarray(gt).save(
                    os.path.join(gt_dir, "IMG-0004-%05d.png" % (i + 1))
                )
    print("fabricated %d volumes in %.1fs" % (len(ALL_VOLUMES), time.time() - t0))


def check_alignment(root):
    """Per-volume aligned pair counts must match the locked expectations."""
    from multimodal_segmentation_tpu.data.chaos_alignment import aligned_indices
    from tests.test_chaos_alignment_lock import FIXED_COUNTS, OPEN_FORMS

    for v in ALL_VOLUMES:
        n1, n2 = RAW_COUNTS[v]
        i1, i2 = aligned_indices(v, n1, n2)
        if v in FIXED_COUNTS:
            expect = FIXED_COUNTS[v][0]
        else:
            expect = OPEN_FORMS[v](n1, n2)
        assert len(i1) == len(i2) == expect, (v, len(i1), len(i2), expect)
    print("alignment counts match the locked table for all 20 volumes")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/chaos_rehearsal/MR")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    if os.path.isdir(args.root) and not args.keep:
        shutil.rmtree(args.root)
    if not os.path.isdir(args.root):
        fabricate_tree(args.root)
    check_alignment(args.root)

    # ingest only (loader-level verification of split sizes)
    os.environ["MMSEG_TPU_CHAOS_DIR"] = args.root
    from multimodal_segmentation_tpu.data.chaos import ChaosLoader
    from multimodal_segmentation_tpu.data.chaos_alignment import aligned_indices

    loader = ChaosLoader()
    assert loader.available()
    t0 = time.time()
    for split_type in ("training", "validation", "test"):
        data = loader.load_all_modalities_concatenated(0, split_type)
        vols = loader.splits()[0][split_type]
        expect = sum(
            len(aligned_indices(v, *RAW_COUNTS[v])[0]) for v in vols
        )
        assert data.size() == expect, (split_type, data.size(), expect)
        i1 = data.get_images_modi(0)
        assert i1.shape[1:] == (192, 192, 1), i1.shape
        print("split0/%s: %d aligned pairs (expected %d), ingest ok"
              % (split_type, data.size(), expect))
    print("ingest %.1fs (first pass decodes DICOM; cache at %s)"
          % (time.time() - t0, loader.cache_dir))

    if args.skip_train:
        return

    # full CLI run — the exact command a real-data user runs
    workdir = "/tmp/chaos_rehearsal_run"
    if os.path.isdir(workdir):
        shutil.rmtree(workdir)
    os.makedirs(workdir)
    cmd = [sys.executable, "-m", "multimodal_segmentation_tpu.experiment",
           "--config", "dafnet_config_chaos", "--split", "0",
           "--epochs", str(args.epochs)]
    if args.bf16:
        cmd += ["--compute_dtype", "bfloat16"]
    # append (not replace) PYTHONPATH: the environment's sitecustomize —
    # which registers the TPU PJRT plugin — is found through it
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    print("running:", " ".join(cmd))
    t0 = time.time()
    subprocess.check_call(cmd, cwd=workdir, env=env)
    print("CLI run %.1fs" % (time.time() - t0))

    # artifact contract (reference experiment.py:46-78 + executor/tester)
    folder = os.path.join(workdir, "dafnet_chaos_l1_t1_t2_split0")
    expected = [
        "experiment_configuration.json",
        "logfile.log",
        "training.csv",
    ]
    for f in expected:
        p = os.path.join(folder, f)
        assert os.path.exists(p), "missing artifact: %s" % p
    with open(os.path.join(folder, "experiment_configuration.json")) as f:
        conf = json.load(f)
    assert conf["dataset_name"] == "chaos" and conf["split"] == 0
    test_dirs = [d for d in os.listdir(folder) if d.startswith("test_results")]
    assert test_dirs, "tester produced no test_results folders"
    import csv

    with open(os.path.join(folder, "training.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) >= args.epochs
    print("artifact contract OK: %s (%d epochs logged, %d test_results dirs)"
          % (folder, len(rows), len(test_dirs)))


if __name__ == "__main__":
    main()
