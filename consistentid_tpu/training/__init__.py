from .dataset import FGIDDataset, synthetic_batch
from .losses import (balanced_l1_loss, collect_attn_probs, localization_loss,
                     localization_loss_for_layer, masked_mse)
from .train_step import (TrainState, consistentid_loss,
                         consistentid_loss_encoded, create_train_state,
                         make_multi_train_step, make_train_step,
                         merge_params, split_params,
                         warm_start_ip_projections)
from .sdxl_loss import sdxl_consistentid_loss
from .precompute import (EncodedFGIDDataset, precompute_conditioning,
                         synthetic_encoded_batch)
