from dreamvla_tpu.diffusion.gaussian import (
    DiffusionSchedule,
    cosine_beta_schedule,
    ddim_sample_loop,
    ddim_timestep_map,
    linear_beta_schedule,
    make_schedule,
    p_sample_loop,
    q_sample,
    respace_schedule,
)
from dreamvla_tpu.diffusion.flow import flow_matching_sample_loop
