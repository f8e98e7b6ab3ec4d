"""Dice parity check for the eval_warp knob (VERDICT r4 item 5).

Loads trained component weights (from a CLI run folder's models/ export),
runs the synthetic test protocol's 'def' and 'max' fusion paths with
eval_warp='bf16' (single-pass Pallas blend) and eval_warp='f32' (exact
XLA-gather path), and reports per-volume binarised Dice for both. The
acceptance bar: Dice unchanged to 3 decimals on every volume.

Usage: python tools/eval_warp_parity.py [--run-folder DIR]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def per_volume_dice(model, params, state, test_data, modality_index, ftype):
    from multimodal_segmentation_tpu import losses

    predict = jax.jit(model.predict_mask, static_argnums=(2, 3))
    vols = test_data.volumes()
    max_len = max(test_data.get_volume_images_modi(0, v).shape[0] for v in vols)
    out = {}
    for v in vols:
        x1 = test_data.get_volume_images_modi(0, v)
        x2 = test_data.get_volume_images_modi(1, v)
        vol_mask = test_data.get_volume_masks_modi(modality_index, v)
        n = x1.shape[0]
        pad = max_len - n
        x1p = np.pad(x1, ((0, pad), (0, 0), (0, 0), (0, 0)))
        x2p = np.pad(x2, ((0, pad), (0, 0), (0, 0), (0, 0)))
        prd = np.asarray(
            predict(params, state, modality_index, ftype,
                    [jnp.asarray(x1p), jnp.asarray(x2p)])
        )[:n]
        out[v] = losses.dice_np(vol_mask, prd, binarise=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-folder",
                    default=os.path.join(REPO, "dafnet_chaos_l1_t1_t2_split0"))
    args = ap.parse_args()

    from multimodal_segmentation_tpu.config import dafnet_chaos
    from multimodal_segmentation_tpu.data.loader_factory import init_loader
    from multimodal_segmentation_tpu.models import build_model
    from multimodal_segmentation_tpu.utils.checkpoint import CheckpointManager

    loader = init_loader("synthetic")
    test_data = loader.load_all_modalities_concatenated(0, "test")
    test_data.crop((192, 192))

    results = {}
    # 'bf16-model': the full-bf16 eval model (eval_dtype knob) — activations
    # bf16 end-to-end, params f32; the strictest parity case.
    for warp in ("bf16", "f32", "bf16-model"):
        conf = dafnet_chaos()
        if warp == "bf16-model":
            conf.compute_dtype = "bfloat16"
        else:
            conf.eval_warp = warp
        model = build_model(conf)
        params, state = model.init(jax.random.PRNGKey(0))
        mgr = CheckpointManager(args.run_folder)
        params, loaded = mgr.load_component_weights(
            os.path.join(args.run_folder, "models"), params
        )
        assert loaded, "no trained component weights in %s/models" % args.run_folder
        for ftype in ("def", "max"):
            dice = per_volume_dice(model, params, state, test_data, 1, ftype)
            results[(warp, ftype)] = dice
            print("eval_warp=%s %-4s per-volume Dice: %s  mean=%.4f"
                  % (warp, ftype,
                     {v: round(d, 4) for v, d in dice.items()},
                     float(np.mean(list(dice.values())))))

    ok = True
    for variant in ("bf16", "bf16-model"):
        for ftype in ("def", "max"):
            for v in results[(variant, ftype)]:
                a = round(results[(variant, ftype)][v], 3)
                b = round(results[("f32", ftype)][v], 3)
                if a != b:
                    ok = False
                    print("MISMATCH %s %s vol %s: %.3f vs f32 %.3f"
                          % (variant, ftype, v, a, b))
    print("eval_warp parity:", "PASS (Dice identical to 3 decimals)" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
