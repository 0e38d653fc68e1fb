"""Loss zoo (reference: losses/__init__.py:1-14): GAN losses, perceptual towers,
expression-space contrastive losses, eval metrics."""
from .gan import (
    adversarial_loss_dis,
    adversarial_loss_gen,
    d_logistic_loss,
    feature_matching_loss,
    g_nonsaturating_loss,
    r1_penalty,
)
from .expression import (
    contrastive_exp_loss,
    contrastive_loss,
    cosine_embedding_loss,
    cosine_sim,
    pull_loss,
    push_loss,
    stm_loss,
    stm_loss_elems,
)
from .metrics import ms_ssim, psnr, ssim
from .perceptual import (
    VGGFeatures,
    make_vgg19_tower,
    make_vggface_tower,
    perceptual_loss,
)
