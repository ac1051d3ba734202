from .image import (center_crop_mask, clip_preprocess, imagenet_preprocess,
                    postprocess_to_uint8, sd_image_preprocess)
