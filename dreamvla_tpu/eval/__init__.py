from dreamvla_tpu.eval.ensemble import AdaptiveEnsembler, TemporalEnsembler
from dreamvla_tpu.eval.policy import PolicyWrapper, build_policy_fn
