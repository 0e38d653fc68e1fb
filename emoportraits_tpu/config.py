"""Typed configuration tree for the volumetric-avatar framework.

The reference threads 200+ argparse flags through a flat Namespace and converts them to
per-module dataclass Configs at model build time (reference: models/stage_1/volumetric_avatar/
va_arguments.py:11-662). Here the config IS the typed tree from day 1, with JSON round-trip
replacing the reference's args.txt snapshot/reparse cycle (reference: utils/args.py:34-65,
train.py:80-83).

Defaults reproduce the production training run (reference: experiments/args.txt:1).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


def _asdict(obj) -> dict:
    return dataclasses.asdict(obj)


def _fromdict(cls, d: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue
        ftype = fields[k].type
        sub = _CONFIG_TYPES.get(ftype if isinstance(ftype, str) else getattr(ftype, "__name__", None))
        if sub is not None and isinstance(v, dict):
            kwargs[k] = _fromdict(sub, v)
        elif isinstance(v, list):
            kwargs[k] = tuple(v)  # JSON has no tuples; tuple-typed fields round-trip
        else:
            kwargs[k] = v
    return cls(**kwargs)


@dataclass(frozen=True)
class VolumeConfig:
    """Latent 3D feature volume geometry (reference: va_arguments.py:245-251; prod values
    experiments/args.txt: latent_volume_channels 96, depth 16, size 64)."""
    channels: int = 96
    depth: int = 16
    size: int = 64


@dataclass(frozen=True)
class LocalEncoderConfig:
    """Source image -> 2D resnet downsample stack -> reshaped latent 3D volume
    (reference: networks/volumetric_avatar/local_encoder.py:26-127)."""
    in_channels: int = 3
    input_image_size: int = 512
    num_channels: int = 32          # gen_num_channels
    channel_mult: float = 4.0       # enc_channel_mult (prod 4)
    max_channels: int = 512         # gen_max_channels
    block_type: str = "res"         # enc_block_type
    norm: str = "gn"                # norm_layer_type (prod gn)
    activation: str = "relu"
    downsampling: str = "avgpool"


@dataclass(frozen=True)
class IdtEmbedConfig:
    """Identity embedder: ResNet-50 trunk -> 1x1 conv -> 4x4x512 map
    (reference: networks/volumetric_avatar/identity_embedder.py:12-93)."""
    backbone: str = "resnet50"
    image_size: int = 256           # idt_image_size
    output_size: int = 4            # idt_output_size (spatial)
    output_channels: int = 512      # idt_output_channels == gen_max_channels
    num_source_frames: int = 1
    norm: str = "gn"
    backbone_width: int = 64        # torchvision width; <64 = test miniature


@dataclass(frozen=True)
class ExpressionEmbedConfig:
    """Expression embedder: theta-aligned 2x-zoom face crop -> ResNet-18 -> 128-d vector
    (reference: networks/volumetric_avatar/expression_embedder.py:132-341)."""
    backbone: str = "resnet18"
    image_size: int = 512
    align_size: int = 256           # lpe_head_backbone input / align crop resolution
    output_channels: int = 128      # lpe_output_channels_expression (prod 128)
    dropout: float = 0.2            # exp_dropout
    norm: str = "gn"
    backbone_width: int = 64        # torchvision width; <64 = test miniature
    # lpe_final_pooling_type (va_arguments.py:339, prod 'avg'): 'transformer' pools
    # the trunk feature map with a ViT cls-token head (utils.py TransformerHead :629)
    final_pooling_type: str = "avg"
    # keypoint->theta fit options (reference expression_embedder.py:254-300;
    # consumed by models.estimate_theta_from_keypoints): 'umeyama' closed form or
    # 'fit' iterative LM; sep_scales = lpe_head_transform_sep_scales 9-param
    # variant (per-axis scales — forces the iterative path)
    theta_fit_method: str = "umeyama"
    theta_fit_sep_scales: bool = False


@dataclass(frozen=True)
class WarpGeneratorConfig:
    """Adaptive-norm 3D conv decoder: 4x4 embed -> dense 3D warp field
    (reference: networks/volumetric_avatar/warp_generator_resnet.py:11-182)."""
    input_channels: int = 512       # gen_max_channels embed channels
    dummy_input_size: int = 4       # == gen_embed_size (va_arguments.py:556)
    output_size: int = 64           # warp_output_size == latent size
    output_depth: int = 16
    num_channels: int = 32          # gen_num_channels
    channel_mult: float = 1.0       # warp_channel_mult (default, not overridden in prod)
    max_channels: int = 512
    block_type: str = "res"         # warp_block_type
    norm: str = "gn"                # adaptive: becomes ada_gn inside
    activation: str = "relu"
    embed_size: int = 4             # gen_embed_size
    # AdaptiveConv branch (reference gen_use_adaconv, va_arguments.py:272-280; the
    # reference's own end-to-end path is dead — predict_embed references
    # warp_embed_head_dict heads that are never constructed, va.py:866 — and its
    # un-passed annealing alpha defaults the deltas to a no-op. Here the branch is
    # runnable: see ops/adaptive.AdaConvEmbedHeads / ProjectorConv.)
    use_adaconv: bool = False       # gen_use_adaconv
    adaptive_conv_type: str = "sum"  # gen_adaptive_conv_type ('sum' | 'mul')
    adaptive_kernel: bool = False   # gen_adaptive_kernel (per-tap deltas)


@dataclass(frozen=True)
class Unet3DConfig:
    """3D U-Net over the volume with learned constant bottleneck
    (reference: networks/volumetric_avatar/unet_3d.py:18-280)."""
    channels: int = 96              # gen_latent_texture_channels
    size: int = 64
    depth: int = 16
    dummy_input_size: int = 8       # bottleneck spatial size
    max_channels: int = 512
    norm: str = "gn"
    activation: str = "relu"
    embed_size: int = 4
    use_skip_resblock: bool = True  # tex_use_skip_resblock


@dataclass(frozen=True)
class VPNResBlocksConfig:
    """Plain 3D res-block stack (reference: networks/volumetric_avatar/vpn_resblocks.py:22,
    resblocks_3d.py:9; prod source_volume_num_blocks 3)."""
    num_blocks: int = 3
    channels: int = 96
    norm: str = "gn"
    activation: str = "relu"


@dataclass(frozen=True)
class DecoderConfig:
    """Volume collapsed to 2D -> adaptive res-blocks -> upsampling image decoder -> RGB
    (reference: networks/volumetric_avatar/decoder.py:20-238 Decoder, :240 ImageDecoder)."""
    in_channels: int = 1536         # volume channels * depth
    image_size: int = 512
    latent_size: int = 64
    num_channels: int = 32          # gen_num_channels
    channel_mult: float = 2.0       # dec_channel_mult (prod 2)
    max_channels: int = 512         # dec_max_channels
    num_blocks: int = 6             # dec_num_blocks (prod 6)
    up_block_type: str = "res"      # dec_up_block_type
    norm: str = "gn"
    activation: str = "relu"
    embed_size: int = 4
    num_lrs_per_resolution: int = 2  # im_dec_num_lrs_per_resolution (prod 2)
    ch_div_factor: float = 1.5       # im_dec_ch_div_factor (prod 1.5)
    use_adanorm: bool = False        # dec_use_adanorm (prod False -> ProjectorNorm path)
    # int8 quantized serving of the decoder's 3x3 convs (forward-only; calibrate the
    # 'quant' collection with a mutable=["quant"] pass). Beyond-reference TPU perf
    # feature: int8 halves the conv-input HBM traffic and runs the int8 MXU path.
    serve_int8: bool = False


@dataclass(frozen=True)
class DiscriminatorConfig:
    """Multi-scale PatchGAN (reference: networks/basic_avatar/multiscale_discriminator.py:9-155;
    prod dis_num_scales 2, dis_num_blocks 4)."""
    min_channels: int = 64
    max_channels: int = 512
    num_blocks: int = 4
    num_scales: int = 2
    input_channels: int = 3


@dataclass(frozen=True)
class StyleGAN2DConfig:
    """StyleGAN2 discriminator (reference: networks/basic_avatar/stylegan2Discriminator.py:245;
    off in prod: use_stylegan_d False)."""
    size: int = 512
    channel_multiplier: int = 1
    blur_kernel: tuple = (1, 3, 3, 1)


@dataclass(frozen=True)
class VolumeRendererConfig:
    """EG3D-style importance renderer (reference: networks/volumetric_avatar/
    volume_renderer.py:96, volume_render_utils.py:127; off in prod)."""
    depth_resolution: int = 48
    depth_resolution_importance: int = 48
    hidden_dim: int = 448
    features: int = 96
    squeeze_dim: int = 96
    ray_start: float = 0.6
    ray_end: float = 2.2


@dataclass(frozen=True)
class HeadPoseConfig:
    """Frozen ResNet-18(9) head-pose regressor (reference: networks/volumetric_avatar/
    head_pose_regressor.py:11-31)."""
    input_size: int = 128


@dataclass(frozen=True)
class LossWeights:
    """Production loss weights (reference: va_arguments.py:364-410 get_weights;
    values from experiments/args.txt:1)."""
    adversarial: float = 1.0
    feature_matching: float = 40.0
    vgg19: float = 18.0
    vgg19_face: float = 10.0
    gaze: float = 10.0
    resnet18_fv_mix: float = 35.0
    pull_exp: float = 1.0
    push_exp: float = 1.0
    stm: float = 10.0
    contrastive_exp: float = 2.0
    eyes_l1: float = 500.0
    mouth_l1: float = 500.0
    ears_l1: float = 500.0
    volumes_l1: float = 0.5
    l1_weight: float = 0.0
    stylegan: float = 1.0
    r1: float = 2.0
    # second-discriminator gen-side multiplier (va_arguments.py:87, default 1.0)
    mix_gen_adversarial: float = 1.0
    # volume-rendering RGB supervision (va_arguments.py:225-231, defaults 0; loss
    # assembly va_losses_and_visuals.py:245-256 at 64px)
    l1_vol_rgb: float = 0.0
    l1_vol_rgb_mix: float = 0.0
    targ_vol_loss_scale: float = 0.0
    # match_neutral losses (va_arguments.py:90,114 defaults 0; assembly
    # va_losses_and_visuals.py:88-96)
    neutral_expr_l1: float = 0.0
    vgg19_neutral: float = 0.0
    # MobileFaceNet landmark loss on retina-box face crops (default 0;
    # assembly va_losses_and_visuals.py:405-428, tower init :765-772)
    landmarks: float = 0.0
    # optional emotion/identity towers on the theta-aligned crops (defaults 0;
    # assembly va_losses_and_visuals.py:356-403, towers :745-763)
    vgg19_emotions: float = 0.0
    resnet18_emotions: float = 0.0
    face_resnet: float = 0.0
    vgg19_fv_mix: float = 0.0
    # Barlow-twins decorrelation of cycle vs target expressions (default 0;
    # va_losses_and_visuals.py:436-455 — the all_reduce there is automatic
    # under GSPMD when the batch axis is mesh-sharded)
    barlow: float = 0.0
    # canonical-volume cosine pull/push (default 0; :117-141)
    volumes_pull: float = 0.0
    volumes_push: float = 0.0
    # warp-delta regularizer (default 0; :430-432 — the reference reads a
    # 'target_motion_deltas' key nothing produces; wired to the real uv/xy
    # deltas here)
    warping_reg: float = 0.0
    # BiSeNet-trunk perceptual on the first batch element (default 0; :177-179)
    perc_face_pars: float = 0.0
    # cycle-consistency gates + per-term weights (defaults 0; :259-295;
    # cycle_idn reads the never-produced pred_identical_cycle in the
    # reference — reconstructed from the pred-cycle expression here)
    cycle_idn: float = 0.0
    cycle_exp: float = 0.0
    # identity InfoNCE on aligned-crop idt embeds (default 0; :581-622 — the
    # reference's idt_embed_face_* inputs are never produced; reconstructed)
    contrastive_idt: float = 0.0
    vgg19_cycle_idn: float = 0.0
    vgg19_face_cycle_idn: float = 0.0
    vgg19_cycle_exp: float = 0.0
    vgg19_face_cycle_exp: float = 0.0


@dataclass(frozen=True)
class OptimizerConfig:
    """AdamW 2e-4, betas (0.5, 0.999), cosine -> 1e-6 over 400k iters
    (reference: va.py:1082-1180 configure_optimizers/schedulers; experiments/args.txt)."""
    opt_type: str = "adamw"
    lr: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    weight_decay: float = 1e-2
    eps: float = 1e-8
    shd_max_iters: int = 400_000
    shd_lr_min: float = 1e-6
    # store the Adam FIRST moment in bf16 (optax mu_dtype) — a 322 MB HBM knob
    # on the 0.64 GB generator at batch-2 512px; the variance (nu) and params
    # stay f32. Off = exact torch-Adam moment precision.
    mu_bf16: bool = False
    # store the SECOND moment in bf16 too (train/state.py _scale_by_adam_nu_bf16:
    # fused elementwise casts inside the moment update — a tree-level cast
    # wrapper measured WORSE than f32 nu). Update math runs in f32; only the
    # persistent buffer is bf16. ~0.4% step-size noise per param.
    nu_bf16: bool = False


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 2              # per device (prod: 2/GPU x 8)
    test_batch_size: int = 4
    max_epochs: int = 400
    train_epoch_len: int = 15000
    test_epoch_len: int = 2000
    image_size: int = 512
    aug_warp_size: int = 512
    use_seg: bool = True
    # mask refinement by the face parser happens in the input pipeline / dataset
    # (reference combines BiSeNet masks with dataset mattes on device, va.py:297-361)
    use_mix_mask: bool = True
    # alternate ibug mask arithmetic (va.py:299-349; prod use_ibug_mask=False)
    use_ibug_mask: bool = False
    # within the ibug branch: True = BiSeNet face_idt arithmetic (va.py:326-328
    # else-branch), False = RTNet tanh-polar parser soft face probability
    # (va.py:300-321 get_lips path; models/rtnet.py here)
    use_old_fp: bool = True
    # AdaptiveConv annealing schedule (va_arguments.py:277-280); only read when the
    # warp generators run with use_adaconv — alpha ramps 0 -> 1 over max_iter steps
    gen_adaptive_use_annealing: bool = False
    gen_adaptive_annealing_type: str = "cos"   # 'lin' | 'cos'
    gen_adaptive_annealing_max_iter: int = 100_000
    green: bool = True               # green-screen background compositing
    sec_dataset_every: int = 4       # FEED batch-splicing cadence (train.py:233-249)
    # when >0, every mead_as_second_every-th splice uses the FEED stream and the
    # rest use MEAD (reference train.py:233-237 alternation counter)
    mead_as_second_every: int = 0
    # eval batches per epoch: 0 = the full held-out epoch like the reference
    # (train.py:305-353); the default caps smoke runs at 8 batches
    eval_max_batches: int = 8
    # epoch gates (reference va_losses_and_visuals.py:182,325,458): the heavy
    # face-part L1s wait 10 epochs; fv_mix and the contrastive family wait 1
    mix_losses_start: int = 1
    contr_losses_start: int = 1
    face_parts_epoch_start: int = 10
    # volumes_l1 schedule (va_losses_and_visuals.py:99-107: active once
    # epoch >= vol_loss_epoch and the within-epoch iteration > 20, ramped by
    # min((epoch - vol_loss_epoch + 1) / vol_loss_grad, 1); prod 1 / 1)
    vol_loss_epoch: int = 1
    vol_loss_grad: float = 1.0
    vol_loss_iter_start: int = 20    # the reference hardcodes iteration > 20
    num_b_negs: int = 1
    # separate_stm (prod True, va_losses_and_visuals.py:500-506): on iterations
    # where `iteration % (sec_dataset_every//2) == 0` (the FEED-spliced batches)
    # the stm term splits — batch element 0 (the spliced extreme-emotion sample)
    # at fixed weight 1.5, elements 1.. at weights.stm
    separate_stm: bool = True
    # resnet18_fv_mix runs on only the first bs_resnet18_fv_mix batch elements
    # (prod 2; va_losses_and_visuals.py:331)
    bs_resnet18_fv_mix: int = 2
    # vgg19 perceptual pyramid depth (prod 4); the step additionally clamps so the
    # smallest level keeps >= 32px through VGG's pools
    vgg19_num_scales: int = 4
    # volume_process_nw update freeze cadence (va.py:517-524; <=0 = off, prod -1):
    # on iterations where `step % freeze_proc_nw == 0` the 3D U-Net's params and
    # optimizer moments are held (torch requires_grad=False equivalent)
    freeze_proc_nw: int = -1
    # ---- input-pipeline augmentation strengths (datasets/voxceleb2hq_pairs.py) ----
    # geometric crop-zoom on train pairs (prod --augment_geometric_train False)
    augment_geometric_train: bool = False
    # color jitter + grayscale pipeline on train pairs (reference default True)
    augment_color_train: bool = True
    # prod --aug_color_coef 10 => ColorJitter(hue .03c, brightness .06*max(1,c/2),
    # contrast .03c, saturation .03c, p=0.8) (voxceleb2hq_pairs.py:91-95)
    aug_color_coef: float = 10.0
    # warp_aug stream ColorJitter(brightness .4, contrast/saturation/hue .4c)
    # + RandomGrayscale(p=.05) (voxceleb2hq_pairs.py:385-391; prod c=1)
    warp_aug_color_coef: float = 1.0
    gray_source_prob: float = 0.0   # A.ToGray prob inside the color pipeline
    pred_mixing: bool = True
    # mixing-pose randomization (va.py:650, non_specific.py:137-152; prod True):
    # with prob 0.5 the mixing pose comes from a 50-deep history pool of past
    # target thetas instead of the current batch (TrainState.thetas_pool ring)
    random_theta: bool = True
    thetas_pool_size: int = 50
    predict_target_canon_vol: bool = True
    match_neutral: bool = False
    # decode cycle images from the re-embedded expressions for the
    # cycle-consistency losses (reference pred_cycle, va.py:739-765; default False)
    pred_cycle: bool = False
    use_stylegan_d: bool = False
    d_reg_every: int = 16        # lazy R1 cadence (va.py:1023-1046)
    # StyleGAN-D base lr (va_arguments.py:350); its Adam runs at
    # lr*d_reg_ratio with betas (0, 0.99)**d_reg_ratio where
    # d_reg_ratio = d_reg_every/(d_reg_every+1) (va.py:1119-1126)
    dis_stylegan_lr: float = 2e-4
    logging_freq: int = 10
    # display-only renormalization of logged losses (prod --normalize_losses True)
    normalize_losses: bool = True
    visuals_freq: int = 200
    checkpoint_freq: int = 10
    latest_checkpoint_freq: int = 1
    seed: int = 0
    bf16_activations: bool = False  # cast batch inputs to bf16 (fp32 params)
    # frozen loss-tower weights in bf16 (head-pose stays fp32 — its thetas feed
    # geometry); the towers are a large share of step FLOPs and tolerate bf16
    bf16_towers: bool = False
    # jax.checkpoint around every frozen loss-tower forward: recompute tower
    # activations in the backward instead of storing them (train/step.py
    # remat_towers). Pairs with ModelConfig.remat for large-batch 512px training.
    remat_towers: bool = False
    # GroupNorm elementwise math in the activation dtype with fp32 reduction
    # accumulators (ops/blocks.py set_gn_lowp_stats) — the batch-2 512px memory
    # knob: the default fp32 GN holds multi-hundred-MB fp32 backward temps per
    # encoder block. Only affects bf16 activations; off = torch f32 semantics.
    bf16_gn_stats: bool = False
    # Lane-packed GroupNorm (ops/blocks.py set_gn_lane_pack): reshape
    # (..., W, C) -> (..., W*C) around the GN elementwise math so C=32/96/192
    # temps stop padding 1.3-4x on the TPU's 128-lane tile. With bf16_gn_stats
    # it selects the packed lowp custom-VJP GN. Part of the batch-2 512px
    # production-geometry stack (DESIGN.md r5 HBM ladder).
    gn_lane_pack: bool = False
    # Avgpool-down conv fusion (ops/blocks.py set_down_fusion): ON wins
    # serving unconditionally, but inside the rematted batch-2 train step the
    # fused stride-2 4x4 convs surface ~1 GB of XLA overlay scratch — the
    # batch-2 stack turns it off for training.
    fuse_down_convs: bool = True
    # EMA of generator params for serving (0 = off; utils/ema.py, updated in-step)
    ema_decay: float = 0.0


@dataclass(frozen=True)
class ParallelConfig:
    """1-D data mesh over ICI; grads reduced with psum inside the jitted step
    (replaces reference NCCL DDP, train.py:66,182-187)."""
    data_axis: str = "data"
    num_devices: int = 1
    # FSDP/ZeRO-3-style parameter+optimizer sharding over the data axis (GSPMD
    # all-gather/reduce-scatter inserted by XLA); off = plain replicated DP
    fsdp: bool = False


@dataclass(frozen=True)
class ModelConfig:
    """Full stage-1 model config: one typed node per subnet (suffix `_nw`/`_ds` naming
    follows the reference convention, utils/non_specific.py:51-57)."""
    volume: VolumeConfig = field(default_factory=VolumeConfig)
    local_encoder: LocalEncoderConfig = field(default_factory=LocalEncoderConfig)
    idt_embedder: IdtEmbedConfig = field(default_factory=IdtEmbedConfig)
    expression_embedder: ExpressionEmbedConfig = field(default_factory=ExpressionEmbedConfig)
    warp_generator: WarpGeneratorConfig = field(default_factory=WarpGeneratorConfig)
    unet3d: Unet3DConfig = field(default_factory=Unet3DConfig)
    # secondary post-warp U-Net used only when unet_first (reference unet3d_cfg_s,
    # va_arguments.py:438-460: dummy_input_size 16, max_channels 96+32)
    unet3d_s: Unet3DConfig = field(
        default_factory=lambda: Unet3DConfig(dummy_input_size=16, max_channels=128))
    vpn_source: VPNResBlocksConfig = field(default_factory=VPNResBlocksConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    # second D judging pred_target (real) vs pred_mixing (fake) when use_mix_dis
    # (reference dis_2_cfg, va_arguments.py:654-661: 64ch / 4 blocks / 2 scales)
    discriminator2: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    stylegan_d: StyleGAN2DConfig = field(default_factory=StyleGAN2DConfig)
    volume_renderer: VolumeRendererConfig = field(default_factory=VolumeRendererConfig)
    head_pose: HeadPoseConfig = field(default_factory=HeadPoseConfig)
    embed_size: int = 4              # gen_embed_size
    max_channels: int = 512          # gen_max_channels
    expression_dim: int = 128        # lpe_output_channels_expression
    use_sn: bool = True              # spectral norm on generator nets (va.py:113-114)
    use_ws: bool = True              # weight-standardized convs (prod use_ws True)
    source_volume_num_blocks: int = 3
    pred_volume_num_blocks: int = 0
    volume_rendering: bool = False
    use_back: bool = False
    use_tensor: bool = False
    use_mix_dis: bool = False
    # theta source (reference --estimate_head_pose_from_keypoints, prod True =
    # frozen HeadPoseRegressor; the INVERTED repo field selects the alternate
    # branch va.py:380-384 where training thetas are FITTED from the stored 68x3
    # landmarks vs the canonical template — method/sep_scales picked by the
    # expression_embedder theta_fit_* knobs)
    theta_from_keypoints: bool = False
    # unet_first (va.py:194-218,505-537; default False): run the embed-conditioned
    # 3D U-Net BEFORE the source warps and a secondary U-Net (unet3d_s) after,
    # instead of VPN blocks before / U-Net after
    unet_first: bool = False
    # periodic latent-volume detach before the source warps (va.py:512-514;
    # <=0 = off, prod -1): on iterations where step % detach_lat_vol == 0 the
    # pre-warp latent volume is stop-gradiented
    detach_lat_vol: int = -1
    grid_sample_padding_mode: str = "reflection"
    warp_norm_grad: bool = False
    # Compose back-to-back warp fields into one volume gather on the inference paths
    # (halves the hot-op bandwidth; off = exact reference semantics of two resamplings).
    fuse_warps: bool = False
    # Rematerialize the heavy subnets (local encoder, 3D U-Net, decoder) in the
    # backward pass (flax nn.remat) — trades FLOPs for activation
    # memory during GAN training at 512px. remat_policy "" recomputes everything;
    # 'dots' saves conv/matmul outputs and recomputes only the elementwise chain
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable).
    remat: bool = False
    remat_policy: str = ""


@dataclass(frozen=True)
class Stage2Config:
    """512px residual enhancer (reference: models/stage_2/base/volumetric_avatar_two.py:
    341-470 net construction, defaults at :59,178-195). Architecture parity with
    local_encoder_old.py + decoder_s2_old.py so the released checkpoint ports."""
    image_size: int = 512            # output_size_s2
    latent_size: int = 64            # gen_latent_texture_size2
    latent_channels: int = 64        # gen_latent_texture_channels2
    latent_depth: int = 16           # gen_latent_texture_depth
    num_channels: int = 32           # gen_num_channels
    enc_channel_mult: float = 4.0    # enc_channel_mult_stage2
    dec_channel_mult: float = 4.0    # dec_channel_mult_stage2
    max_channels: int = 512          # gen_max_channels / dec_max_channels2
    dec_num_blocks: int = 8          # dec_num_blocks_stage2
    # dec_img_feat_blocks channel ladder (decoder_s2_old.py:404-441: 128 strided,
    # then 128 -> 64 -> 32); shrink for tests
    dec_feat_channels: tuple = (128, 128, 64, 32)
    norm: str = "gn"
    activation: str = "relu"
    # --- stage-2 training semantics (volumetric_avatar_two.py argparse defaults:
    #     :55 resize_s2, :73 use_second_dis, :82-86 weights, :157 cycle_stage2,
    #     :168 pred_mixing_stage2, :181-182 diff_ratio/mask_threshold) ---
    adversarial: float = 1.0         # adversarial_weight
    adversarial_gen: float = 1.0     # extra gen-side multiplier on the main D
    adversarial_gen_2: float = 1.0   # gen-side weight of the second (mixing) D
    feature_matching: float = 60.0   # feature_matching_weight
    vgg19: float = 20.0              # vgg19_weight
    l1_weight: float = 0.0
    use_second_dis: bool = True
    pred_mixing: bool = True         # pred_mixing_stage2
    cycle_stage2: float = 0.0        # weight of the down-res consistency terms
    resize_s2: int = 128             # 'area' resize target for cycle/mix terms
    diff_ratio: float = 5.0          # L1_ffhq_diff = (diff_ratio-1)*l1 on the diff mask
    mask_threshold: float = 0.01     # per-channel threshold of the diff mask


@dataclass(frozen=True)
class ExperimentConfig:
    """Root config: model + losses + optimization + data + parallel."""
    experiment_name: str = "default"
    model: ModelConfig = field(default_factory=ModelConfig)
    stage2: Stage2Config = field(default_factory=Stage2Config)
    weights: LossWeights = field(default_factory=LossWeights)
    gen_opt: OptimizerConfig = field(default_factory=OptimizerConfig)
    dis_opt: OptimizerConfig = field(default_factory=OptimizerConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def to_json(self, path: str | None = None) -> str:
        s = json.dumps(_asdict(self), indent=2)
        if path is not None:
            with open(path, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_json(cls, s_or_path: str) -> "ExperimentConfig":
        if s_or_path.lstrip().startswith("{"):
            d = json.loads(s_or_path)
        else:
            with open(s_or_path) as f:
                d = json.load(f)
        return _fromdict(cls, d)


_CONFIG_TYPES = {
    c.__name__: c
    for c in [
        VolumeConfig, LocalEncoderConfig, IdtEmbedConfig, ExpressionEmbedConfig,
        WarpGeneratorConfig, Unet3DConfig, VPNResBlocksConfig, DecoderConfig,
        DiscriminatorConfig, StyleGAN2DConfig, VolumeRendererConfig, HeadPoseConfig,
        LossWeights, OptimizerConfig, TrainConfig, ParallelConfig, ModelConfig,
        Stage2Config, ExperimentConfig,
    ]
}


def tiny_config() -> ExperimentConfig:
    """A small config for tests: 64px images, 16^3-ish volume, few channels."""
    vol = VolumeConfig(channels=8, depth=4, size=16)
    return ExperimentConfig(
        experiment_name="tiny",
        model=ModelConfig(
            volume=vol,
            local_encoder=LocalEncoderConfig(
                input_image_size=64, num_channels=4, channel_mult=2.0, max_channels=32),
            idt_embedder=IdtEmbedConfig(image_size=64, output_channels=32,
                                        backbone_width=8),
            expression_embedder=ExpressionEmbedConfig(
                image_size=64, align_size=64, output_channels=16, backbone_width=8),
            warp_generator=WarpGeneratorConfig(
                input_channels=32, dummy_input_size=4, output_size=16, output_depth=4,
                num_channels=4, channel_mult=2.0, max_channels=32, embed_size=4),
            unet3d=Unet3DConfig(
                channels=8, size=16, depth=4, dummy_input_size=4, max_channels=32),
            vpn_source=VPNResBlocksConfig(num_blocks=1, channels=8),
            decoder=DecoderConfig(
                in_channels=32, image_size=64, latent_size=16, num_channels=4,
                channel_mult=2.0, max_channels=32, num_blocks=2,
                num_lrs_per_resolution=1, ch_div_factor=2.0),
            discriminator=DiscriminatorConfig(
                min_channels=8, max_channels=32, num_blocks=2, num_scales=2),
            max_channels=32,
            expression_dim=16,
            source_volume_num_blocks=1,
        ),
        # epoch gates at 0 so one-step tests exercise the FULL loss set
        train=TrainConfig(batch_size=2, image_size=64, aug_warp_size=64,
                          mix_losses_start=0, contr_losses_start=0,
                          face_parts_epoch_start=0, vol_loss_epoch=0,
                          vol_loss_iter_start=-1),
    )


# --------------------------------------------------------------- reference args.txt

def _str2bool(v: str) -> bool:
    return str(v).lower() in ("true", "1", "yes")


# reference flag -> (dotted config path, converter). Paths are relative to the root
# ExperimentConfig; converters run on the raw string token.
_REF_ARG_MAP = {
    "image_size": [("train.image_size", int), ("model.local_encoder.input_image_size", int),
                   ("model.expression_embedder.image_size", int),
                   ("model.decoder.image_size", int)],
    "aug_warp_size": [("train.aug_warp_size", int)],
    "batch_size": [("train.batch_size", int)],
    "test_batch_size": [("train.test_batch_size", int)],
    "max_epochs": [("train.max_epochs", int)],
    "train_epoch_len": [("train.train_epoch_len", int)],
    "test_epoch_len": [("train.test_epoch_len", int)],
    "latent_volume_channels": [("model.volume.channels", int)],
    "gen_latent_texture_channels": [("model.volume.channels", int)],
    "latent_volume_depth": [("model.volume.depth", int)],
    "gen_latent_texture_depth": [("model.volume.depth", int)],
    "latent_volume_size": [("model.volume.size", int)],
    "gen_latent_texture_size": [("model.volume.size", int)],
    "lpe_output_channels_expression": [
        ("model.expression_embedder.output_channels", int),
        ("model.expression_dim", int)],
    "exp_dropout": [("model.expression_embedder.dropout", float)],
    "lpe_final_pooling_type": [
        ("model.expression_embedder.final_pooling_type", str)],
    "enc_channel_mult": [("model.local_encoder.channel_mult", float)],
    "dec_channel_mult": [("model.decoder.channel_mult", float)],
    "dec_max_channels": [("model.decoder.max_channels", int)],
    "dec_num_blocks": [("model.decoder.num_blocks", int)],
    "im_dec_num_lrs_per_resolution": [("model.decoder.num_lrs_per_resolution", int)],
    "im_dec_ch_div_factor": [("model.decoder.ch_div_factor", float)],
    "gen_dummy_input_size": [("model.warp_generator.dummy_input_size", int),
                             ("model.unet3d.dummy_input_size", int)],
    "gen_embed_size": [("model.embed_size", int)],
    "gen_max_channels": [("model.max_channels", int)],
    "gen_use_adaconv": [("model.warp_generator.use_adaconv", _str2bool)],
    "gen_adaptive_conv_type": [("model.warp_generator.adaptive_conv_type", str)],
    "gen_adaptive_kernel": [("model.warp_generator.adaptive_kernel", _str2bool)],
    "gen_adaptive_use_annealing": [("train.gen_adaptive_use_annealing", _str2bool)],
    "gen_adaptive_annealing_type": [("train.gen_adaptive_annealing_type", str)],
    "gen_adaptive_annealing_max_iter": [
        ("train.gen_adaptive_annealing_max_iter", int)],
    "source_volume_num_blocks": [("model.source_volume_num_blocks", int)],
    "pred_volume_num_blocks": [("model.pred_volume_num_blocks", int)],
    "volume_rendering": [("model.volume_rendering", _str2bool)],
    "use_back": [("model.use_back", _str2bool)],
    "use_tensor": [("model.use_tensor", _str2bool)],
    "use_mix_dis": [("model.use_mix_dis", _str2bool)],
    "use_ws": [("model.use_ws", _str2bool)],
    "use_sn": [("model.use_sn", _str2bool)],
    "grid_sample_padding_mode": [("model.grid_sample_padding_mode", str)],
    "dis_num_scales": [("model.discriminator.num_scales", int)],
    "dis_num_blocks": [("model.discriminator.num_blocks", int)],
    "dis2_num_scales": [("model.discriminator2.num_scales", int)],
    "dis2_num_blocks": [("model.discriminator2.num_blocks", int)],
    "dis2_num_channels": [("model.discriminator2.min_channels", int)],
    "use_seg": [("train.use_seg", _str2bool)],
    "green": [("train.green", _str2bool)],
    "use_mix_mask": [("train.use_mix_mask", _str2bool)],
    "use_ibug_mask": [("train.use_ibug_mask", _str2bool)],
    "use_old_fp": [("train.use_old_fp", _str2bool)],
    "use_stylegan_d": [("train.use_stylegan_d", _str2bool)],
    "d_reg_every": [("train.d_reg_every", int)],
    "dis_stylegan_lr": [("train.dis_stylegan_lr", float)],
    "match_neutral": [("train.match_neutral", _str2bool)],
    "predict_target_canon_vol": [("train.predict_target_canon_vol", _str2bool)],
    "sec_dataset_every": [("train.sec_dataset_every", int)],
    "num_b_negs": [("train.num_b_negs", int)],
    "mix_losses_start": [("train.mix_losses_start", int)],
    "contr_losses_start": [("train.contr_losses_start", int)],
    "vol_loss_epoch": [("train.vol_loss_epoch", int)],
    "vol_loss_grad": [("train.vol_loss_grad", float)],
    "random_theta": [("train.random_theta", _str2bool)],
    "logging_freq": [("train.logging_freq", int)],
    "normalize_losses": [("train.normalize_losses", _str2bool)],
    "visuals_freq": [("train.visuals_freq", int)],
    "checkpoint_freq": [("train.checkpoint_freq", int)],
    "gen_opt_type": [("gen_opt.opt_type", str)],
    "dis_opt_type": [("dis_opt.opt_type", str)],
    "gen_beta1": [("gen_opt.beta1", float)],
    "dis_beta1": [("dis_opt.beta1", float)],
    "gen_lr": [("gen_opt.lr", float)],
    "dis_lr": [("dis_opt.lr", float)],
    "gen_shd_max_iters": [("gen_opt.shd_max_iters", int)],
    "dis_shd_max_iters": [("dis_opt.shd_max_iters", int)],
    # loss weights (va_arguments.py:364-410 naming)
    "adversarial_weight": [("weights.adversarial", float)],
    "feature_matching_weight": [("weights.feature_matching", float)],
    "vgg19_weight": [("weights.vgg19", float)],
    "vgg19_face": [("weights.vgg19_face", float)],
    "gaze_weight": [("weights.gaze", float)],
    "resnet18_fv_mix": [("weights.resnet18_fv_mix", float)],
    "pull_exp": [("weights.pull_exp", float)],
    "push_exp": [("weights.push_exp", float)],
    "stm": [("weights.stm", float)],
    "contrastive_exp": [("weights.contrastive_exp", float)],
    "w_eyes_loss_l1": [("weights.eyes_l1", float)],
    "w_mouth_loss_l1": [("weights.mouth_l1", float)],
    "w_ears_loss_l1": [("weights.ears_l1", float)],
    "volumes_l1": [("weights.volumes_l1", float)],
    "l1_weight": [("weights.l1_weight", float)],
    "stylegan_weight": [("weights.stylegan", float)],
    "r1": [("weights.r1", float)],
    "mix_gen_adversarial": [("weights.mix_gen_adversarial", float)],
    "l1_vol_rgb": [("weights.l1_vol_rgb", float)],
    "l1_vol_rgb_mix": [("weights.l1_vol_rgb_mix", float)],
    "neu_exp_l1": [("weights.neutral_expr_l1", float)],
    "vgg19_neutral": [("weights.vgg19_neutral", float)],
    "contrastive_idt": [("weights.contrastive_idt", float)],
    "face_resnet": [("weights.face_resnet", float)],
    "perc_face_pars": [("weights.perc_face_pars", float)],
    "vgg19_fv_mix": [("weights.vgg19_fv_mix", float)],
    "vgg19_num_scales": [("train.vgg19_num_scales", int)],
    "separate_stm": [("train.separate_stm", _str2bool)],
    "bs_resnet18_fv_mix": [("train.bs_resnet18_fv_mix", int)],
    "mead_as_second_every": [("train.mead_as_second_every", int)],
    "detach_lat_vol": [("model.detach_lat_vol", int)],
    "freeze_proc_nw": [("train.freeze_proc_nw", int)],
    "unet_first": [("model.unet_first", _str2bool)],
    "dec_use_adanorm": [("model.decoder.use_adanorm", _str2bool)],
    "lpe_face_backbone": [("model.expression_embedder.backbone", str)],
    "lpe_head_transform_sep_scales": [
        ("model.expression_embedder.theta_fit_sep_scales", _str2bool)],
    # prod True = frozen regressor; False = keypoint-fitted thetas (inverted here)
    "estimate_head_pose_from_keypoints": [
        ("model.theta_from_keypoints", lambda v: not _str2bool(v))],
    # every generator subnet reads the same norm switch (va_arguments passes
    # args.norm_layer_type into each subconfig)
    "norm_layer_type": [("model.local_encoder.norm", str),
                        ("model.idt_embedder.norm", str),
                        ("model.expression_embedder.norm", str),
                        ("model.warp_generator.norm", str),
                        ("model.unet3d.norm", str),
                        ("model.unet3d_s.norm", str),
                        ("model.vpn_source.norm", str),
                        ("model.decoder.norm", str)],
    # input-pipeline augmentation knobs (datasets/voxceleb2hq_pairs.py:537-552)
    "aug_color_coef": [("train.aug_color_coef", float)],
    "warp_aug_color_coef": [("train.warp_aug_color_coef", float)],
    "gray_source_prob": [("train.gray_source_prob", float)],
    "augment_geometric_train": [("train.augment_geometric_train", _str2bool)],
    "augment_color_train": [("train.augment_color_train", _str2bool)],
    "experiment_name": [("experiment_name", str)],
}

# Reference flags with NO live counterpart here, by design — documented so the
# parser can distinguish "known-inert" from "silently dropped". Categories:
#   infra:   torch-launcher / device-count flags replaced by the JAX process model
#   logging: print/save toggles with repo equivalents that are always-on or CLI-side
#   dataset: stream selection is by CLI data-root paths, not name flags
#   dead:    reference options whose prod value disables a branch this framework
#            implements differently or that the reference itself never exercises
#            (citations in docs/PARITY notes)
_KNOWN_INERT_FLAGS = {
    "num_gpus": "infra (JAX process/device model)",
    "master_port": "infra (torch.distributed launcher)",
    "nproc_per_node": "infra (torch.distributed launcher)",
    "dataset_name": "dataset (streams chosen by --data-root CLIs)",
    "dataset_name_test": "dataset",
    "use_sec_dataset": "dataset (FEED stream = --second-data-root presence)",
    "custom_test": "logging (enabled by Trainer(custom_test_images=...))",
    "print_norms": "logging",
    "print_model": "logging",
    "save_exp_vectors": "logging",
    "use_amp": "infra (precision is train.bf16_activations / bf16_towers)",
    "use_masked_aug": "dead (prod False; masked-face aug source for warp_aug)",
    "separate_idt": "dead (prod False; va.py separate-identity embed variant)",
    "dec_pred_seg": "dead (prod False; decoder segmentation head)",
    "old_mix_pose": "dead (prod False; legacy mixing-pose path — "
                    "geometry/transforms.py implements the new polar path)",
    "emb_v_exp": "dead (prod False; expression embed volume variant)",
    "dec_no_detach_frec": "dead (prod 1 = never-detach branch in decoder feed)",
    "dec_key_emb": "dead (prod 'orig_d' is the implemented embed-key path)",
}


def _replace_path(cfg: "ExperimentConfig", dotted: str, value):
    parts = dotted.split(".")

    def rec(node, i):
        if i == len(parts) - 1:
            return dataclasses.replace(node, **{parts[i]: value})
        child = getattr(node, parts[i])
        return dataclasses.replace(node, **{parts[i]: rec(child, i + 1)})

    return rec(cfg, 0)


def from_reference_args(text_or_path: str, strict: bool = False):
    """Build an ExperimentConfig from a reference `args.txt` command line
    (the snapshot saved next to every reference checkpoint — utils/args.py:34-65;
    e.g. /root/reference/experiments/args.txt). Returns (config, unknown_flags):
    flags with no counterpart are collected. Flags in the documented
    `_KNOWN_INERT_FLAGS` set pass silently; any OTHER unmapped flag is warned
    about (or raises under strict=True) — a non-default value there would be
    silently mis-parsed, which is exactly what this function exists to prevent."""
    import os
    import warnings

    text = text_or_path
    if os.path.exists(text_or_path):
        with open(text_or_path) as f:
            text = f.read()
    tokens = text.split()
    cfg = ExperimentConfig()
    unknown = {}
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if not tok.startswith("--"):
            i += 1
            continue
        name = tok[2:]
        if "=" in name:  # --key=value form (argparse emits both)
            name, value = name.split("=", 1)
            i += 1
        else:
            value = tokens[i + 1] if i + 1 < len(tokens) else ""
            i += 2
        if name in _REF_ARG_MAP:
            for dotted, conv in _REF_ARG_MAP[name]:
                cfg = _replace_path(cfg, dotted, conv(value))
        else:
            unknown[name] = value
    surprises = sorted(set(unknown) - set(_KNOWN_INERT_FLAGS))
    if surprises:
        msg = (f"reference args contain unmapped, undocumented flags: {surprises} "
               "— add them to _REF_ARG_MAP or _KNOWN_INERT_FLAGS")
        if strict:
            raise ValueError(msg)
        warnings.warn(msg)
    return cfg, unknown
