from .block_infer import make_sharded_forward, stack_device_batches
from .dp import TrainState, make_dp_eval_step, make_dp_train_step
from .mesh import make_mesh
