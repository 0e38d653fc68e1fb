"""Model zoo: stage-1 volumetric avatar subnets + orchestration, discriminators,
stage-2 enhancer, frozen vision towers."""
from .background import BackgroundAdding, BackgroundEncoder, UNet2D
from .decoder import Decoder
from .discriminator import MultiScaleDiscriminator, PatchDiscriminator
from .expression_embedder import (
    ExpressionEmbed,
    align_face_crop,
    estimate_theta_from_keypoints,
    theta_to_crop_grid,
)
from .face_parsing import BiSeNet, FaceParser
from .head_pose import HeadPoseRegressor
from .identity_embedder import IdtEmbed, adaptive_avg_pool
from .local_encoder import LocalEncoder
from .matting import MattingNet
from .stage1 import AvatarState, VolumetricAvatar
from .stage2 import Stage2Enhancer
from .stylegan2_d import DiscriminatorStyleGAN2
from .unet3d import Unet3D
from .volume_renderer import VolumeRenderer, ray_march
from .vpn_resblocks import VPNResBlocks
from .warp_generator import WarpGenerator, resize_trilinear
