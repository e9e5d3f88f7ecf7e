from dreamvla_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from dreamvla_tpu.parallel.train_step import TrainState, build_train_step, create_train_state
