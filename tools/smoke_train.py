"""Full-size TPU smoke training: DAFNet on the synthetic CHAOS fixture.

Runs a short real-geometry training (192x192, batch 6) and prints the
validation-Dice trajectory — a learning-dynamics sanity check on hardware.
Usage: python tools/smoke_train.py [epochs]
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import logging
import shutil

logging.basicConfig(level=logging.INFO)


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from multimodal_segmentation_tpu.config import dafnet_chaos
    from multimodal_segmentation_tpu.models import build_model
    from multimodal_segmentation_tpu.train.executor import make_executor

    conf = dafnet_chaos()
    conf.dataset_name = "synthetic"
    conf.test_dataset = "synthetic"
    conf.epochs = epochs
    conf.swa_start_epoch = max(2, epochs // 2)
    conf.folder = "/tmp/smoke_dafnet"
    shutil.rmtree(conf.folder, ignore_errors=True)

    model = build_model(conf)
    ex = make_executor(conf, model)
    ex.train()
    ex.test()


if __name__ == "__main__":
    main()
