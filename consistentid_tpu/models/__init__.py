from .clip import CLIPTextEncoder, CLIPVisionEncoder
from .unet import UNet, localization_layer_names
from .vae import AutoencoderKL
