"""Full-size TPU smoke training: DAFNet on the synthetic CHAOS fixture.

Runs a short real-geometry training (192x192, batch 6) and prints the
validation-Dice trajectory — a learning-dynamics sanity check on hardware.
Usage: python tools/smoke_train.py [epochs] [--automatedpairing]
       [--randomise] [--folder F]

With --automatedpairing the run is the learning-evidence channel for the
Balancer path: training.csv gains val_weight_j columns (mean balancer
weight per candidate pair, dafnet_executor.py:356-367) which should
diverge from uniform 1/n_pairs as the balancer learns.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import logging
import shutil

logging.basicConfig(level=logging.INFO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("epochs", nargs="?", type=int, default=10)
    ap.add_argument("--automatedpairing", action="store_true")
    ap.add_argument("--randomise", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--folder", default="/tmp/smoke_dafnet")
    args = ap.parse_args()
    epochs = args.epochs
    from multimodal_segmentation_tpu.config import dafnet_chaos
    from multimodal_segmentation_tpu.models import build_model
    from multimodal_segmentation_tpu.train.executor import make_executor

    conf = dafnet_chaos()
    conf.dataset_name = "synthetic"
    conf.test_dataset = "synthetic"
    conf.epochs = epochs
    conf.swa_start_epoch = max(2, epochs // 2)
    conf.automatedpairing = args.automatedpairing
    conf.randomise = args.randomise
    if args.bf16:
        conf.compute_dtype = "bfloat16"
    conf.folder = args.folder
    shutil.rmtree(conf.folder, ignore_errors=True)

    model = build_model(conf)
    ex = make_executor(conf, model)
    ex.train()
    ex.test()


if __name__ == "__main__":
    main()
