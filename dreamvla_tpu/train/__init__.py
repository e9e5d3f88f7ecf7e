from dreamvla_tpu.train.losses import LossOutputs, compute_losses, silog_loss
from dreamvla_tpu.train.optimizer import build_optimizer, build_lr_schedule
