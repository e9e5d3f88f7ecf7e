"""DreamVLA-TPU: a TPU-native Vision-Language-Action framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of DreamVLA
(reference: Zhangwenyao1/DreamVLA, arXiv 2507.04447): a VLA policy that embeds
text/state/images, appends learnable "dream" query tokens, runs a causal
transformer trunk with a block-structured attention mask, decodes per-modality
world-knowledge predictions (RGB / depth / DINO / SAM / optical-flow), and
emits action chunks through either an MLP head or a DiT diffusion /
flow-matching head.

Everything in the compute path is functional JAX: the trunk attention runs a
Pallas flash-attention kernel fed by a mask *function* (never a materialised
parameter buffer), diffusion sampling is a `lax.scan`, and data parallelism is
a `jax.sharding.Mesh` with XLA collectives instead of NCCL.
"""

__version__ = "0.1.0"
