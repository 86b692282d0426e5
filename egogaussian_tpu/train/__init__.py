from egogaussian_tpu.train.common import (
    TrainState,
    render_gaussians,
    mask_grad,
    image_loss,
    opacity_entropy,
)
from egogaussian_tpu.train.static import train_static, train_background
from egogaussian_tpu.train.coarse_pose import estimate_coarse_obj_pose
from egogaussian_tpu.train.fine_obj import fine_tune_obj
from egogaussian_tpu.train.fine_all import fine_tune_all
