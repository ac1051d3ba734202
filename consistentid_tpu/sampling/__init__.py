from .sampler import CondBranch, denoise
from .schedulers import (NoiseSchedule, SamplerPlan, ddim_plan, ddpm_plan,
                         euler_plan, make_plan)
