"""Frozen loss-tower construction: one factory for the trainer, the multi-chip dryrun,
and tests.

The reference builds its frozen evaluators inside Model.init_losses
(va_losses_and_visuals.py:726-795): VGG19 + VGGFace perceptual towers, the RT-GENE gaze
estimator, the ResNet-18 face-vector net (utils.py:1449), and the BiSeNet face parser +
MODNet matting as model attributes (va.py:255-279). Here they are explicit
(apply_fn, params) constants in `LossTowers` — pure inputs to the jitted step.

`tiny=True` swaps every tower for a shape-compatible miniature (same layer names, same
interfaces, ~1000x fewer FLOPs) so unit tests and the CPU-mesh dryrun compile in
seconds while exercising the FULL prod loss set.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from ..losses.face_vector import make_face_vector_tower
from ..losses.perceptual import VGG16_STAGES, VGG19_STAGES, VGGFeatures
from ..models.face_parsing import BiSeNet, normalize_for_parsing
from ..models.head_pose import HeadPoseRegressor
from ..models.matting import MattingNet
from .step import LossTowers

# five one-conv stages: keeps relu_{1..5}_1 feature names valid for perceptual_loss
# and gaze_loss while compiling ~instantly
_TINY_STAGES = ((1, 4), (1, 4), (1, 4), (1, 4), (1, 4))


class FrozenNets(NamedTuple):
    """The frozen nets that run inside the generator FORWARD (not just losses):
    mask refinement + mixing matting (va.py:297-361, :682-684)."""
    face_parsing: Optional[Tuple] = None  # (apply, params): img01 -> (B,H,W,19) logits
    matting: Optional[Tuple] = None       # (apply, params): img01 -> (B,H,W,1) alpha
    # RTNet-role tanh-polar parser for the use_old_fp=False ibug branch
    # (va.py:300-321): (apply, params): (img01, keypoints) -> (B,H,W,1) face prob
    rtnet: Optional[Tuple] = None
    # per-tower weight provenance: 'ported' (real checkpoint supplied), 'random'
    # (full architecture, random init), 'tiny' (miniature stand-in); matting reports
    # 'modnet_ported' vs 'standin_*' so a prod run can't silently use the stand-in
    provenance: Dict[str, str] = {}


def assert_towers_ported(frozen: FrozenNets) -> None:
    """Strict-towers gate: every built tower must carry ported real weights.

    The reference always loads real frozen evaluators from disk
    (va_losses_and_visuals.py:726-795); random/tiny towers are a test-only
    convenience here, so `--strict-towers` runs fail loudly on them."""
    bad = {k: v for k, v in frozen.provenance.items()
           if v not in ("ported", "modnet_ported")}
    if bad:
        raise RuntimeError(
            "strict-towers: these frozen towers lack ported real weights: "
            f"{bad}. Supply them via tower_variables (port/cli.py towers ...).")


def build_loss_towers(
    cfg: ExperimentConfig,
    key: jax.Array,
    variables: Optional[Dict[str, Any]] = None,
    *,
    tiny: bool = False,
) -> Tuple[LossTowers, FrozenNets]:
    """Build every frozen tower the prod loss set needs.

    `variables` may carry ported real weights per tower name ('vgg19', 'vggface',
    'gaze', 'face_vector', 'face_parsing', 'matting', 'head_pose'); missing entries are
    randomly initialized (tests / synthetic runs still exercise the full code paths).
    """
    variables = variables or {}
    w = cfg.weights
    s = cfg.train.image_size
    keys = jax.random.split(key, 9)
    init_img = jnp.zeros((1, min(s, 64 if tiny else s), min(s, 64 if tiny else s), 3),
                         jnp.float32)

    kw: Dict[str, Any] = {}

    # --- head pose (always needed by the forward) ---
    if tiny:
        # interface-compatible miniature: mean-pool -> Dense(9) -> theta, replacing
        # four full ResNet-18 passes per step (src/tgt/pred/mix re-regression)
        from flax import linen as nn

        from ..geometry.transforms import get_transform_matrix
        from ..ops.blocks import Dense

        class _TinyHeadPose(nn.Module):
            @nn.compact
            def __call__(self, x, return_srt=False):
                out = jnp.tanh(Dense(9, name="fc")(jnp.mean(x, axis=(1, 2)))) * 0.2
                # scale anchored at 1 so theta stays invertible and the aligned
                # crops land on the image (the real regressor's ported weights
                # produce calibrated scales; a raw random head would emit ~0)
                s, r, t = 1.0 + out[:, :3], out[:, 3:6], out[:, 6:9]
                theta = get_transform_matrix(s, r, t)
                return (theta, s, r, t) if return_srt else theta

        hp = _TinyHeadPose()
    else:
        hp = HeadPoseRegressor()
    hp_vars = variables.get("head_pose") or jax.jit(hp.init)(
        keys[0], jnp.zeros((1, s, s, 3), jnp.float32))
    kw["head_pose_apply"] = lambda p, x, return_srt=False, _n=hp: _n.apply(
        p, x, return_srt)
    kw["head_pose_params"] = hp_vars

    # --- perceptual towers ---
    if w.vgg19 > 0:
        vgg19 = VGGFeatures(stages=_TINY_STAGES if tiny else VGG19_STAGES)
        kw["vgg19_apply"] = vgg19.apply
        kw["vgg19_params"] = variables.get("vgg19") or jax.jit(vgg19.init)(
            keys[1], init_img)
    if w.vgg19_face > 0:
        vggface = VGGFeatures(stages=_TINY_STAGES if tiny else VGG16_STAGES)
        kw["vggface_apply"] = vggface.apply
        kw["vggface_params"] = variables.get("vggface") or jax.jit(vggface.init)(
            keys[2], init_img)

    # --- gaze towers (RT-GENE; losses/gaze.py eye crops are 36x60). The released
    #     checkpoint carries SEPARATE left/right VGG16 towers (port_gaze returns
    #     {'left','right'}); random init shares one tower for both eyes. ---
    if w.gaze > 0:
        gaze_net = VGGFeatures(stages=_TINY_STAGES if tiny else VGG16_STAGES)
        kw["gaze_apply"] = gaze_net.apply
        kw["gaze_params"] = variables.get("gaze") or jax.jit(gaze_net.init)(
            keys[3], jnp.zeros((1, 36, 60, 3), jnp.float32))

    # --- optional emotion/identity towers (all 0 in prod;
    #     va_losses_and_visuals.py:745-763) ---
    if w.face_resnet > 0:
        from ..models.backbones.senet import SENet50

        fr_layers = (1, 1, 1, 1) if tiny else (3, 4, 6, 3)
        fr_net = SENet50(layers=fr_layers, block_taps=True)
        n_taps = sum(fr_layers)
        kw["face_resnet_apply"] = lambda p, img, _n=fr_net: _n.apply(p, img)[1]
        kw["face_resnet_params"] = variables.get("face_resnet") or jax.jit(
            fr_net.init)(jax.random.fold_in(key, 10), init_img)
        kw["face_resnet_layers"] = tuple(f"relu{i + 1}" for i in range(n_taps))
        # reference tap weights (va_losses_and_visuals.py:747-750); even for tiny
        kw["face_resnet_weights"] = (
            (0.03125,) * 3 + (0.0625,) * 3 + (0.125,) * 3 + (0.25,) * 4
            + (1.0,) * 3) if not tiny else (0.25,) * n_taps
    if w.vgg19_emotions > 0:
        from ..losses.emotion import EmotionVGG

        ev_net = EmotionVGG(stages=((1, 4),) * 5) if tiny else EmotionVGG()
        kw["emotion_vgg_apply"] = ev_net.apply
        kw["emotion_vgg_params"] = variables.get("emotion_vgg") or jax.jit(
            ev_net.init)(jax.random.fold_in(key, 11),
                         jnp.zeros((1, 55, 55, 3), jnp.float32))
    if w.resnet18_emotions > 0:
        from ..losses.emotion import make_emotion_resnet_tower

        er_apply, er_params = make_emotion_resnet_tower(
            jax.random.fold_in(key, 12), image_size=64 if tiny else 224,
            width=8 if tiny else 64)
        kw["emotion_resnet_apply"] = er_apply
        kw["emotion_resnet_params"] = (variables.get("emotion_resnet")
                                       or er_params)

    # --- landmark tower (w=0 in prod; 'landmarks' perceptual config,
    #     va_losses_and_visuals.py:765-772) ---
    if w.landmarks > 0:
        from ..losses.emotion import MobileFaceNetFeatures

        lm_net = MobileFaceNetFeatures()
        kw["landmark_apply"] = lm_net.apply
        kw["landmark_params"] = variables.get("landmark") or jax.jit(lm_net.init)(
            keys[8], jnp.zeros((1, 112, 112, 3), jnp.float32))

    # --- face-vector recognizer (resnet18_fv_mix) ---
    if w.resnet18_fv_mix > 0:
        if tiny:
            fv_net = VGGFeatures(stages=_TINY_STAGES)
            fv_params = variables.get("face_vector") or jax.jit(fv_net.init)(
                keys[4], init_img)
            fv_embed = lambda p, img, _n=fv_net: jnp.mean(
                _n.apply(p, img)["relu_5_1"], axis=(1, 2))
        else:
            fv_embed, fv_params = make_face_vector_tower(keys[4])
            if variables.get("face_vector") is not None:
                fv_params = variables["face_vector"]
        kw["face_vector_embed"] = fv_embed
        kw["face_vector_params"] = fv_params

    # --- face parser: part masks (w=500 losses) + use_mix_mask refinement ---
    face_parsing = None
    if (w.eyes_l1 > 0 or w.mouth_l1 > 0 or w.ears_l1 > 0
            or cfg.train.use_mix_mask):
        if tiny:
            from ..ops.blocks import Conv
            from flax import linen as nn

            class _TinyParser(nn.Module):
                @nn.compact
                def __call__(self, x):
                    return Conv(19, (3, 3), name="head")(x)

            fp_net = _TinyParser()
            fp_params = variables.get("face_parsing") or jax.jit(fp_net.init)(
                keys[5], init_img)
        else:
            fp_net = BiSeNet()
            fp_params = variables.get("face_parsing") or fp_net.init(
                keys[5], jnp.zeros((1, s, s, 3), jnp.float32))
        fp_apply = lambda p, img, _n=fp_net: _n.apply(p, normalize_for_parsing(img))
        kw["face_parsing_apply"] = fp_apply
        kw["face_parsing_params"] = fp_params
        face_parsing = (fp_apply, fp_params)

    # --- perc_face_pars: BiSeNet ResNet-trunk feature taps feat4..feat32
    #     (0 in prod; reference _bisenet_FP reuses the parser's own trunk,
    #     perceptual.py:506-529) ---
    if w.perc_face_pars > 0:
        _FP_TAPS = ("feat4", "feat8", "feat16", "feat32")
        if tiny:
            fpp_net = VGGFeatures(stages=_TINY_STAGES[:4])
            fpp_params = jax.jit(fpp_net.init)(jax.random.fold_in(key, 13),
                                               init_img)
            kw["face_pars_feats_apply"] = (
                lambda p, img, _n=fpp_net: dict(zip(_FP_TAPS, [
                    _n.apply(p, img)[f"relu_{i}_1"] for i in range(1, 5)])))
        else:
            from ..models.backbones.resnet import ResNet

            trunk = ResNet(layers=(2, 2, 2, 2), block="basic", norm="bn")
            if face_parsing is not None or (w.eyes_l1 > 0 or w.mouth_l1 > 0
                                            or w.ears_l1 > 0
                                            or cfg.train.use_mix_mask):
                # share the parser's own ported trunk (reference semantics)
                fpp_params = {"params": (variables.get("face_parsing")
                                         or fp_params)["params"]["resnet"]}
            else:
                fpp_params = jax.jit(trunk.init)(
                    jax.random.fold_in(key, 13),
                    jnp.zeros((1, 224, 224, 3), jnp.float32))
            # input normalization happens in the loss engine
            # (normalization='imagenet' == normalize_for_parsing)
            kw["face_pars_feats_apply"] = (
                lambda p, img, _n=trunk: dict(zip(_FP_TAPS, _n.apply(
                    p, img, return_features=True)[1])))
        kw["face_pars_feats_params"] = fpp_params

    # --- RTNet tanh-polar parser (ibug use_old_fp=False branch, va.py:300-321) ---
    rtnet = None
    if cfg.train.use_mix_mask and cfg.train.use_ibug_mask \
            and not cfg.train.use_old_fp:
        from ..models.rtnet import RTNetParser, tiny_rtnet

        rt_net = tiny_rtnet() if tiny else RTNetParser()
        rt_params = variables.get("rtnet") or jax.jit(rt_net.init)(
            keys[7], init_img,
            jnp.asarray([[8.0, 8.0, 56.0, 56.0]], jnp.float32))
        rtnet = (lambda p, img, kp, _n=rt_net: _n.apply(
            p, img, kp, method=_n.face_mask_from_keypoints), rt_params)

    # --- matting (MODNet role): mixing-image mask (va.py:682-684) ---
    matting = None
    if cfg.train.pred_mixing and cfg.train.use_mix_mask:
        if variables.get("modnet") is not None:
            # ported real MODNet (models/modnet.py, exact checkpoint architecture)
            from ..models.modnet import MODNet, modnet_matte

            mn = MODNet()
            matting = (lambda p, img, _n=mn: modnet_matte(_n.apply, p, img),
                       variables["modnet"])
        else:
            mt_net = MattingNet(base_channels=4 if tiny else 16,
                                num_levels=2 if tiny else 4)
            mt_params = variables.get("matting") or jax.jit(mt_net.init)(
                keys[6], init_img)
            matting = (lambda p, img, _n=mt_net: _n.apply(p, img), mt_params)

    # --- provenance: which towers run real ported weights vs stand-ins ---
    default_kind = "tiny" if tiny else "random"
    prov: Dict[str, str] = {}
    for kw_key, var_name in (
            ("head_pose_params", "head_pose"), ("vgg19_params", "vgg19"),
            ("vggface_params", "vggface"), ("gaze_params", "gaze"),
            ("face_resnet_params", "face_resnet"),
            ("emotion_vgg_params", "emotion_vgg"),
            ("emotion_resnet_params", "emotion_resnet"),
            ("landmark_params", "landmark"),
            ("face_vector_params", "face_vector"),
            ("face_parsing_params", "face_parsing")):
        if kw_key in kw:
            prov[var_name] = ("ported" if variables.get(var_name) is not None
                              else default_kind)
    if rtnet is not None:
        prov["rtnet"] = ("ported" if variables.get("rtnet") is not None
                         else default_kind)
    if matting is not None:
        if variables.get("modnet") is not None:
            prov["matting"] = "modnet_ported"
        elif variables.get("matting") is not None:
            prov["matting"] = "standin_ported"
        else:
            prov["matting"] = f"standin_{default_kind}"

    return LossTowers(**kw), FrozenNets(face_parsing=face_parsing, matting=matting,
                                        rtnet=rtnet, provenance=prov)
