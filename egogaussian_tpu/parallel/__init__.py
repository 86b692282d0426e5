from egogaussian_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from egogaussian_tpu.parallel.data_parallel import (
    data_parallel_train_step,
    make_dp_train_step,
)
from egogaussian_tpu.parallel.multi_scene import (
    multi_scene_coarse_step,
    multi_scene_static_step,
    stack_scenes,
    unstack_scenes,
)
from egogaussian_tpu.parallel.scene_trainer import (
    CoarseSceneInput,
    SceneInput,
    train_background_scenes,
    train_coarse_scenes,
    train_static_scenes,
)
