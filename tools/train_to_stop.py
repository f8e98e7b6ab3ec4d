"""Reference-regime training run: full DAFNet, default config (500-epoch
cap, SWA from epoch 40, early-stop patience 60) on the synthetic CHAOS
fixture, on real hardware (VERDICT r1 item 4).

This is where long-horizon bugs live: SWA engaging mid-run, early stopping,
checkpoint rotation over hundreds of epochs, GAN stability. The run also
exercises mid-run resume: pass --resume to continue from the folder's
latest checkpoint (kill + rerun = preemption recovery drill).

Usage:
    python tools/train_to_stop.py [--folder F] [--epochs N] [--bf16]
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import logging
import time

logging.basicConfig(level=logging.INFO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", default="/tmp/dafnet_longrun")
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the folder before starting")
    args = ap.parse_args()

    if args.fresh:
        import shutil

        shutil.rmtree(args.folder, ignore_errors=True)

    from multimodal_segmentation_tpu.config import dafnet_chaos
    from multimodal_segmentation_tpu.models import build_model
    from multimodal_segmentation_tpu.train.executor import make_executor

    conf = dafnet_chaos()
    conf.dataset_name = "synthetic"
    conf.test_dataset = "synthetic"
    conf.epochs = args.epochs  # default cap: dafnet_config_chaos.py:7
    conf.folder = args.folder
    if args.bf16:
        conf.compute_dtype = "bfloat16"
    # heavy artifacts every 10 epochs: image grids + per-component npz
    # each pull megabytes through the remote relay; training dynamics
    # (SWA, early stop, checkpoint rotation) are unaffected.
    conf.image_callback_interval = 10
    conf.component_save_interval = 10
    # each Orbax save device_gets the full train state through the relay
    # (~minutes); resume granularity of 10 epochs is the drill's tradeoff
    conf.checkpoint_interval = 10

    model = build_model(conf)
    ex = make_executor(conf, model)
    t0 = time.time()
    ts = ex.train()
    wall = time.time() - t0
    print(json.dumps({
        "wall_s": round(wall, 1),
        "epochs_done": int(ts.epoch) + 1,
        "steps": int(ts.step),
    }))
    ex.test()


if __name__ == "__main__":
    main()
