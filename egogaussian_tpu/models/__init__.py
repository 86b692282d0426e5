from egogaussian_tpu.models.gaussians import (
    GaussianParams,
    GaussianAux,
    GaussianModel,
    from_points,
    combine_models,
    compact,
    save_ply,
    load_ply,
)
from egogaussian_tpu.models.optim import AdamState, adam_init, adam_update
from egogaussian_tpu.models.densify import (
    add_densification_stats,
    densify_and_prune,
    reset_opacity,
    prune_by_opacity,
)
from egogaussian_tpu.models.pose import (
    ObjectPose,
    identity_pose,
    pose_to_se3,
    PoseSequence,
)
