"""Experiment driver (reference experiment.py).

Same CLI surface:
  python -m multimodal_segmentation_tpu.experiment --config dafnet_config_chaos
      --split 0 [--l_mix f] [--test] [--automatedpairing] [--randomise]
      [--test_dataset chaos]

Same artifact contract: output folder named by config + l_mix + modality +
split (experiment.py:46-63), experiment_configuration.json with the git
hash (experiment.py:69-78), logfile.log (experiment.py:21-29).
"""

import argparse
import dataclasses
import json
import logging
import os
import subprocess
import sys


def read_console_parameters(argv=None):
    """reference experiment.py:100-111."""
    parser = argparse.ArgumentParser(description="")
    parser.add_argument("--config", default="", help="The experiment settings")
    parser.add_argument("--test", help="Evaluate the model on test data", action="store_true")
    parser.add_argument("--split", help="Data split to run", required=True)
    parser.add_argument("--l_mix", help="Fraction of labelled data")
    parser.add_argument("--automatedpairing", help="Use automated pairing", action="store_true")
    parser.add_argument("--randomise", help="Randomise pairs", action="store_true")
    parser.add_argument("--test_dataset", help="Override test dataset")
    parser.add_argument("--epochs", help="Override number of epochs")
    parser.add_argument("--dataset", help="Override training dataset")
    parser.add_argument(
        "--compute_dtype",
        help="Activation dtype: float32 (default) or bfloat16",
        choices=["float32", "bfloat16"],
    )
    return parser.parse_args(argv)


def build_config(args):
    """reference experiment.py:31-72 (config resolution + folder naming)."""
    from multimodal_segmentation_tpu.config import get_config

    conf = get_config(args.config)
    conf.split = int(args.split)
    # folder naming parity with reference experiment.py:44-63:
    # <folder>[_randomise][_automatedpairing]_l<l_mix>_<modalities>_split<N>
    # with '.' stripped. DEVIATION: the reference renders the modality list
    # as str(['t1','t2']) — brackets/quotes in the path break
    # orbax/tensorstore checkpoint RESTORE (save works, restore cannot open
    # the OCDBT store), so modalities render as t1_t2 here.
    folder = conf.folder
    if args.randomise or conf.randomise:
        conf.randomise = True
        folder += "_randomise"
    if args.automatedpairing or conf.automatedpairing:
        conf.automatedpairing = True
        folder += "_automatedpairing"
    l_mix = conf.l_mix
    if args.l_mix is not None:
        conf.l_mix = float(args.l_mix)
        l_mix = args.l_mix
    folder += "_l%g" % float(l_mix)
    folder += "_" + "_".join(conf.modality)
    folder += "_split%s" % conf.split
    folder = folder.replace(".", "")
    if args.test_dataset:
        conf.test_dataset = args.test_dataset
    if args.dataset:
        conf.dataset_name = args.dataset
    if args.epochs:
        conf.epochs = int(args.epochs)
    if args.compute_dtype:
        conf.compute_dtype = args.compute_dtype
    conf.folder = folder
    return conf


def init_logging(folder):
    """reference experiment.py:21-29."""
    os.makedirs(folder, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        handlers=[
            logging.FileHandler(os.path.join(folder, "logfile.log")),
            logging.StreamHandler(sys.stderr),
        ],
    )


def save_config(conf):
    """experiment_configuration.json with git hash (experiment.py:69-78)."""
    d = dataclasses.asdict(conf)
    try:
        d["githash"] = (
            subprocess.check_output(["git", "rev-parse", "HEAD"], cwd=os.path.dirname(__file__))
            .decode()
            .strip()
        )
    except Exception:
        d["githash"] = "unknown"
    with open(
        os.path.join(conf.folder, "experiment_configuration.json"), "w"
    ) as f:
        json.dump(d, f, indent=2, default=str)


class Experiment:
    """reference experiment.py:80-98."""

    def run(self, argv=None):
        args = read_console_parameters(argv)
        conf = build_config(args)
        init_logging(conf.folder)
        save_config(conf)

        import jax

        if conf.debug_nans:
            # debug-config NaN guard (SURVEY.md §5.2)
            jax.config.update("jax_debug_nans", True)

        from multimodal_segmentation_tpu.models import build_model
        from multimodal_segmentation_tpu.train.executor import make_executor

        if conf.model == "cardiac3d":
            # volumetric stretch family (models/volumetric.py)
            from multimodal_segmentation_tpu.models.volumetric import (
                Cardiac3DExecutor,
            )

            executor = Cardiac3DExecutor(conf)
            if not args.test:
                executor.train()
            executor.test()
            return

        model = build_model(conf)
        executor = make_executor(conf, model)
        if not args.test:
            executor.train()
        else:
            ts, _ = executor.create_state()
            executor.final_state = ts
        executor.test()


if __name__ == "__main__":
    Experiment().run()
