from dreamvla_tpu.data.transforms import clip_image_transform, depth_to_tensor
from dreamvla_tpu.data.collate import WindowCollator
from dreamvla_tpu.data.loader import DataInfo, PrefetchLoader, ShardedSampler
from dreamvla_tpu.data.calvin import CalvinDataset, get_calvin_dataset
from dreamvla_tpu.data.libero import LiberoDataset, get_libero_dataset
from dreamvla_tpu.data.tokenizer import get_tokenizer
