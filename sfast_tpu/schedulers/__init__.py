from sfast_tpu.schedulers.common import SchedulerConfig
from sfast_tpu.schedulers.ddim import DDIMScheduler
from sfast_tpu.schedulers.euler import (
    EulerDiscreteScheduler,
    EulerAncestralDiscreteScheduler,
)
from sfast_tpu.schedulers.dpm import DPMSolverMultistepScheduler
from sfast_tpu.schedulers.lcm import LCMScheduler
from sfast_tpu.schedulers.compile import compile_scheduler

__all__ = [
    "SchedulerConfig",
    "DDIMScheduler",
    "EulerDiscreteScheduler",
    "EulerAncestralDiscreteScheduler",
    "DPMSolverMultistepScheduler",
    "LCMScheduler",
    "compile_scheduler",
]
