"""Experiment CLI tests: argument parsing, folder naming, config presets."""

import json
import os

import pytest

from multimodal_segmentation_tpu.config import get_config
from multimodal_segmentation_tpu.experiment import (
    build_config,
    read_console_parameters,
    save_config,
)


class TestCLI:
    def test_folder_naming_matches_reference(self):
        # reference experiment.py:44-63 naming, '.' stripped
        args = read_console_parameters(
            ["--config", "dafnet_config_chaos", "--split", "0", "--l_mix", "0.5"]
        )
        conf = build_config(args)
        # modalities render as t1_t2 (not str(list)): bracket/quote chars
        # in paths break orbax/tensorstore restore (see build_config)
        assert conf.folder == "dafnet_chaos_l05_t1_t2_split0"
        assert conf.l_mix == 0.5

    def test_automated_and_randomise_flags(self):
        args = read_console_parameters(
            [
                "--config", "dafnet_config_chaos", "--split", "1",
                "--automatedpairing", "--randomise",
            ]
        )
        conf = build_config(args)
        assert conf.automatedpairing and conf.randomise
        assert conf.folder == (
            "dafnet_chaos_randomise_automatedpairing_l1_t1_t2_split1"
        )

    def test_presets_resolve(self):
        for name in (
            "mmsdnet_config_chaos",
            "dafnet_config_chaos",
            "dafnet_spade_config_chaos",
        ):
            conf = get_config(name)
            assert conf.input_shape == (192, 192, 1)
        assert get_config("mmsdnet_config_chaos").w_rec_X == 10.0
        assert get_config("mmsdnet_config_chaos").d_mask_params.filters == 4
        assert get_config("dafnet_spade_config_chaos").decoder_type == "spade"

    def test_unknown_config_raises(self):
        with pytest.raises(ValueError):
            get_config("nope")

    def test_save_config_writes_json_with_githash(self, tmp_path):
        conf = get_config("dafnet_config_chaos")
        conf.folder = str(tmp_path / "exp")
        os.makedirs(conf.folder)
        save_config(conf)
        with open(os.path.join(conf.folder, "experiment_configuration.json")) as f:
            d = json.load(f)
        assert d["model"] == "dafnet"
        assert "githash" in d

    def test_test_dataset_override(self):
        args = read_console_parameters(
            ["--config", "dafnet_config_chaos", "--split", "0",
             "--test_dataset", "synthetic"]
        )
        conf = build_config(args)
        assert conf.test_dataset == "synthetic"


    def test_folder_name_is_checkpoint_safe(self):
        # orbax/tensorstore cannot restore from paths containing [ ] ' "
        args = read_console_parameters(
            ["--config", "dafnet_spade_config_chaos", "--split", "2"]
        )
        conf = build_config(args)
        assert not any(c in conf.folder for c in "[]'\""), conf.folder
