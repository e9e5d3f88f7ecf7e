from dreamvla_tpu.extract.dinov2 import DinoV2ViT, import_dinov2
from dreamvla_tpu.extract.sam_encoder import SAMImageEncoder, import_sam_encoder
