from dreamvla_tpu.models.layers import MlpBlock, MultiHeadSelfAttention, ViTBlock
from dreamvla_tpu.models.vit_mae import MaskedAutoencoderViT
from dreamvla_tpu.models.resampler import PerceiverResampler
from dreamvla_tpu.models.gpt2 import GPT2Trunk
from dreamvla_tpu.models.clip_text import CLIPTextEncoder
from dreamvla_tpu.models.decoders import ModalityDecoder
from dreamvla_tpu.models.dit import DiT
from dreamvla_tpu.models.dreamvla import DreamVLA, DreamVLAOutputs
