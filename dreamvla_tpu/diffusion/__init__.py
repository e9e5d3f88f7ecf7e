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
from dreamvla_tpu.diffusion.vlb import (
    LossSecondMomentResampler,
    UniformSampler,
    calc_bpd_loop,
    discretized_gaussian_log_likelihood,
    normal_kl,
    prior_bpd,
    vb_terms_bpd,
    vlb_training_loss,
)
