from .config import (
    AdapterConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
    LlamaConfig,
    LlavaConfig,
    PipelineConfig,
    SchedulerConfig,
    TrainConfig,
    UNetConfig,
    VAEConfig,
    clip_text_bigg_config,
    clip_text_l_config,
    sd15_unet_config,
    sdxl_unet_config,
)
from .dtypes import FP32, INFERENCE, TRAINING, DTypePolicy, cast_floating
