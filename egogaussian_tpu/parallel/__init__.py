from egogaussian_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from egogaussian_tpu.parallel.data_parallel import (
    data_parallel_train_step,
    make_dp_train_step,
)
