from dreamvla_tpu.extract.cotracker3 import (CoTracker3Config,
                                             CoTracker3GridTracker,
                                             import_cotracker3)
from dreamvla_tpu.extract.dinov2 import DinoV2ViT, import_dinov2
from dreamvla_tpu.extract.sam_encoder import SAMImageEncoder, import_sam_encoder
