"""PyTorch checkpoint -> flax param-pytree porters.

  torch_port   low-level kernel/linear/bn converters + backbone porters (ResNet, VGG)
  stage1_port  the full stage-1 `*_model.pth` state_dict (every `*_nw` subnet,
               spectral-norm weight_orig/u/v, WS convs) with unmatched-key manifests
  stage2_port  the stage-2 enhancer checkpoint
  towers_port  frozen towers: head-pose, BiSeNet 79999_iter, LPIPS-alex, MODNet,
               RT-GENE gaze (left/right VGG16 pair)
"""
from .stage1_port import port_stage1
from .stage2_port import port_stage2
from .torch_port import port_resnet, port_vgg_face_dag, port_vgg_features
from .towers_port import (
    port_bisenet,
    port_gaze,
    port_head_pose,
    port_lpips,
    port_modnet,
)

__all__ = [
    "port_stage1", "port_stage2", "port_resnet", "port_vgg_features",
    "port_vgg_face_dag", "port_bisenet", "port_gaze", "port_head_pose",
    "port_lpips", "port_modnet",
]
