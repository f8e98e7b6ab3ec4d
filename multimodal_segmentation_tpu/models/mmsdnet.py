"""MMSDNet: per-modality private anatomy encoders, mask discriminator only,
and a separately-trained Z-regressor.

Reference: models/mmsdnet.py. The 18-output supervised/unsupervised trainers
(:95-192) become `gen_loss`; the separately-fit Z_Regressor (:194-208,
trained in model_executors/mmsdnet_executor.py:267-276 on detached
anatomies) becomes `z_regressor_loss` differentiated w.r.t. decoder +
modality-encoder parameters only.
"""

from typing import Dict

import jax
import jax.numpy as jnp

from multimodal_segmentation_tpu import losses
from multimodal_segmentation_tpu.models.base import (
    ComponentSet,
    batch_deinterleave,
    batch_interleave,
    subsample_pool,
)
from multimodal_segmentation_tpu.nn import (
    AnatomyEncoder,
    AnatomyFuser,
    Decoder,
    Discriminator,
    ModalityEncoder,
    Segmentor,
)


class MMSDNet:
    GEN_COMPONENTS = (
        "enc_anatomy1",
        "enc_anatomy2",
        "fuser",
        "enc_modality",
        "segmentor",
        "decoder",
    )
    DISC_COMPONENTS = ("d_mask",)
    ZREG_COMPONENTS = ("decoder", "enc_modality")

    def __init__(self, conf):
        self.conf = conf
        ae = conf.anatomy_encoder
        dtype = jnp.dtype(getattr(conf, "compute_dtype", "float32"))
        c = ComponentSet()
        for name in ("enc_anatomy1", "enc_anatomy2"):
            c.add(
                name,
                AnatomyEncoder(
                    filters=ae.filters,
                    downsample=ae.downsample,
                    norm=ae.normalise,
                    out_channels=ae.out_channels,
                    rounding=ae.rounding,
                    dtype=dtype,
                    remat=getattr(conf, "remat_convs", False),
                ),
            )
        c.add("fuser", AnatomyFuser(
            dtype=dtype,
            tps_impl=getattr(conf, "tps_impl", "auto"),
            eval_blend_bf16=getattr(conf, "eval_warp", "f32") == "bf16",
        ))
        c.add("enc_modality", ModalityEncoder(conf.num_z, dtype=dtype))
        c.add("segmentor", Segmentor(conf.num_masks, dtype=dtype, remat=getattr(conf, "remat_convs", False)))
        c.add("decoder", Decoder(conf.decoder_type, conf.input_hw, dtype=dtype))
        c.add(
            "d_mask",
            Discriminator(
                conf.d_mask_params.filters,
                conf.d_mask_params.downsample_blocks,
                dtype=dtype,
            ),
        )
        self.components = c
        self.modalities = list(conf.modality)

    def init(self, rng):
        conf = self.conf
        H, W = conf.input_hw
        C = conf.input_shape[-1]
        sc = conf.anatomy_encoder.out_channels
        x = jnp.zeros((1, H, W, C))
        s = jnp.zeros((1, H, W, sc))
        m = jnp.zeros((1, H, W, conf.num_masks))

        keys = jax.random.split(rng, 8)
        params: Dict = {}
        state: Dict = {}

        def setup(i, name, *args, rngs_extra=()):
            p, st = self.components.init_component(
                name, keys[i], *args, rngs_extra=rngs_extra
            )
            params[name] = p
            for col, tree in st.items():
                state.setdefault(col, {})[name] = tree

        setup(0, "enc_anatomy1", x)
        setup(1, "enc_anatomy2", x)
        setup(2, "fuser", s, s)
        setup(3, "enc_modality", s, x, rngs_extra=("sample",))
        setup(4, "segmentor", s)
        setup(5, "decoder", s, jnp.zeros((1, conf.num_z)))
        setup(6, "d_mask", m)
        return params, state

    # ------------------------------------------------------------- helpers

    def encode_anatomy(self, params, state, idx, x, train=False, update=False):
        name = "enc_anatomy%d" % (idx + 1)
        s, new_st, _ = self.components.apply(
            name, params, state, x, train=train, update_state=update
        )
        state = self.components.merge_state(state, name, new_st)
        return s, state

    def segment(self, params, state, s, train=False, update=False, groups=1):
        m, new_st, _ = self.components.apply(
            "segmentor", params, state, s, train=train, update_state=update,
            groups=groups,
        )
        state = self.components.merge_state(state, "segmentor", new_st)
        return m, state

    def fuse(self, params, state, sa, sb, train=False, fast=False):
        (s_def, s_fused), _, _ = self.components.apply(
            "fuser", params, state, sa, sb, train=train, fast=fast
        )
        return s_def, s_fused

    def encode_modality(self, params, state, s, x, rng, train=False, sample=True):
        (z, mu, logvar, kl), _, _ = self.components.apply(
            "enc_modality",
            params,
            state,
            s,
            x,
            train=train,
            rngs={"sample": rng} if sample else None,
            sample=sample,
        )
        return z, mu, logvar, kl

    def decode(self, params, state, s, z, train=False):
        y, _, _ = self.components.apply("decoder", params, state, s, z, train=train)
        return y

    def discriminate(self, params, state, x, collect_spectral=False):
        out, new_st, penalty = self.components.apply(
            "d_mask", params, state, x, collect_spectral=collect_spectral
        )
        if collect_spectral:
            state = self.components.merge_state(state, "d_mask", new_st)
            return out, penalty, state
        return out

    # ------------------------------------------------------ generator loss

    def gen_loss(self, gen_params, disc_params, state, batch, rng, supervised):
        """18-output trainer loss (models/mmsdnet.py:95-192; targets from
        model_executors/mmsdnet_executor.py:242-306)."""
        conf = self.conf
        params = {**gen_params, **disc_params}
        nm = conf.num_masks
        x1, x2 = batch["x1"], batch["x2"]
        # one RNG stream: all six VAE encodings sample in a single batched
        # call below (the reference's six per-call streams are collapsed;
        # statistically equivalent)
        key_z = rng

        cat = batch_interleave
        split = batch_deinterleave

        # As in DAFNet, every component the reference applies K times per
        # batch runs as ONE batch-stacked call (per-invocation BN statistics
        # preserved by grouped BN where the component has BatchNorm);
        # interleaved stacking (ops/batching.py) keeps 'data'-mesh rows local.
        s1, state = self.encode_anatomy(params, state, 0, x1, True, True)
        s2, state = self.encode_anatomy(params, state, 1, x2, True, True)

        # both fusion directions in one LocNet/warp call
        (s_def, s_fused), _, _ = self.components.apply(
            "fuser", params, state, cat([s1, s2]), cat([s2, s1]), train=True
        )
        s1_def, s2_def = split(s_def, 2)
        s1_fused, s2_fused = split(s_fused, 2)

        # all six modality encodings in one VAE call; s1-derived anatomies
        # pair with x2 (mmsdnet.py:117-124)
        s_all = cat([s1, s2, s1_def, s1_fused, s2_def, s2_fused])
        x_pair = cat([x1, x2, x2, x2, x1, x1])
        z_all, _, _, kl_all = self.encode_modality(
            params, state, s_all, x_pair, key_z, True
        )
        kl1, kl2, kl_s1def, kl_s1fus, kl_s2def, kl_s2fus = split(kl_all, 6)

        # all six segmentations in one grouped call
        m_all, state = self.segment(params, state, s_all, True, True, groups=6)
        m1, m2 = split(m_all, 6)[:2]
        fused_ms = split(m_all, 6)[2:]

        # all six reconstructions in one decoder call
        y_all = self.decode(params, state, s_all, z_all, True)
        ys = split(y_all, 6)
        y1, y2 = ys[0], ys[1]

        rec_list = [
            (x1, y1),
            (x2, y2),
            (x2, ys[2]),
            (x2, ys[3]),
            (x1, ys[4]),
            (x1, ys[5]),
        ]

        m1_t = batch.get("m1")
        if supervised:
            m2_t = batch["m2"]
            # targets [m1, m2, m2, m2, m1, m1] (mmsdnet_executor.py:185-189)
            seg_pairs = [
                (m1_t, m1),
                (m2_t, m2),
                (m2_t, fused_ms[0]),
                (m2_t, fused_ms[1]),
                (m1_t, fused_ms[2]),
                (m1_t, fused_ms[3]),
            ]
            adv_list = [m1, m2] + fused_ms
        else:
            # only modality-1 masks exist (mmsdnet.py:107-116,136-144)
            seg_pairs = [(m1_t, m1), (m1_t, fused_ms[2]), (m1_t, fused_ms[3])]
            adv_list = [m1, m2] + fused_ms

        seg = sum(
            losses.restricted_dice_loss(t, p, nm) for t, p in seg_pairs
        )
        # one discriminator call over all six adversarial masks
        adv_all = self.discriminate(
            params, state, cat([m[..., :nm] for m in adv_list])
        )
        adv_m = sum(
            losses.lsgan_fool(a) for a in split(adv_all, len(adv_list))
        )
        rec = sum(losses.mae(t, p) for t, p in rec_list)
        kl = sum(
            losses.ypred_loss(k)
            for k in (kl1, kl2, kl_s1def, kl_s1fus, kl_s2def, kl_s2fus)
        )

        total = (
            conf.w_sup_M * seg
            + conf.w_adv_M * adv_m
            + conf.w_rec_X * rec
            + conf.w_kl * kl
        )
        metrics = {
            "supervised_Mask": seg,
            "adv_M": adv_m,
            "rec_X": rec,
            "KL": kl,
            "loss": total,
        }
        return total, (metrics, state)

    # ------------------------------------------------------ z-regressor

    def make_z_regressor_anatomies(self, params, state, x1, x2):
        """The 6 anatomy variants fed to the Z-regressor, computed in predict
        mode and detached (mmsdnet_executor.py:267-276)."""
        s1, _ = self.encode_anatomy(params, state, 0, x1, False, False)
        s2, _ = self.encode_anatomy(params, state, 1, x2, False, False)
        s1_def, s1_fused = self.fuse(params, state, s1, s2, False)
        s2_def, s2_fused = self.fuse(params, state, s2, s1, False)
        return [
            jax.lax.stop_gradient(s)
            for s in (s1, s2, s1_def, s1_fused, s2_def, s2_fused)
        ]

    def z_regressor_loss(self, zreg_params, other_params, state, s_list, z_list, rng):
        """Z-regressor loss: mae(z, Enc_Modality_mu(s, Decoder(s, z))) summed
        over the 6 (s, z) pairs (models/mmsdnet.py:194-208)."""
        params = {**other_params, **zreg_params}
        total = 0.0
        for i, (s, z) in enumerate(zip(s_list, z_list)):
            y = self.decode(params, state, s, z, True)
            _, mu, _, _ = self.encode_modality(
                params, state, s, y, jax.random.fold_in(rng, i), True, sample=False
            )
            total = total + losses.mae(z, mu)
        total = self.conf.w_rec_Z * total
        return total, ({"rec_Z": total}, state)

    # ------------------------------------------------- discriminator loss

    def d_mask_loss(self, d_params, gen_params, state, batch, rng):
        """Single mask-discriminator update per batch
        (mmsdnet_executor.py:308-331): fake pool = simple segmentations of
        both modalities + deformed + fused of modality 1, subsampled."""
        params = {**gen_params, **d_params}
        nm = self.conf.num_masks
        x1, x2 = batch["dx1"], batch["dx2"]
        m_real = batch["dm"][..., :nm]
        B = m_real.shape[0]

        s1, _ = self.encode_anatomy(params, state, 0, x1, False, False)
        s2, _ = self.encode_anatomy(params, state, 1, x2, False, False)
        m1_hat, _ = self.segment(params, state, s1, False, False)
        m2_hat, _ = self.segment(params, state, s2, False, False)
        s1_def, s1_fused = self.fuse(params, state, s1, s2, False)
        m_def, _ = self.segment(params, state, s1_def, False, False)
        m_fus, _ = self.segment(params, state, s1_fused, False, False)

        # pool draw as a streaming per-slot select (subsample_pool): the
        # TPU-native form of the reference's concat + np.random.choice
        fake_m = jax.lax.stop_gradient(subsample_pool(
            rng,
            [m1_hat[..., :nm], m2_hat[..., :nm], m_def[..., :nm], m_fus[..., :nm]],
        ))

        d_real, penalty, state = self.discriminate(
            params, state, m_real, collect_spectral=True
        )
        d_fake = self.discriminate(params, state, fake_m)
        total = losses.lsgan_disc(d_real, d_fake) + penalty
        return total, ({"dis_M": total}, state)

    # ------------------------------------------------------------ inference

    def predict_mask(self, params, state, modality_index, fusion_type, images):
        """models/mmsdnet.py:210-232."""
        assert fusion_type in ("simple", "def", "max", "maxnostn")
        idx2 = modality_index
        idx1 = 1 - idx2
        s1, _ = self.encode_anatomy(params, state, idx1, images[idx1], False, False)
        s2, _ = self.encode_anatomy(params, state, idx2, images[idx2], False, False)
        if fusion_type == "simple":
            s = s2
        elif fusion_type == "maxnostn":
            s = jnp.maximum(s1, s2)
        else:
            # fast=True: eval_warp='bf16' routes this warp through the
            # single-pass Pallas blend (inference only — see nn/fuser.py)
            s_def, s_fused = self.fuse(params, state, s1, s2, False, fast=True)
            s = s_def if fusion_type == "def" else s_fused
        m, _ = self.segment(params, state, s, False, False)
        return m
