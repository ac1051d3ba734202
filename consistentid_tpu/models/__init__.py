from .clip import CLIPTextEncoder, CLIPVisionEncoder
from .unet import UNet, localization_layer_names
from .vae import AutoencoderKL
from .arcface import IResNet, make_face_embedder, normalized_embedding
from .bisenet import BiSeNet, make_face_parser
from .scrfd import SCRFD, SCRFDConfig, make_face_detector
