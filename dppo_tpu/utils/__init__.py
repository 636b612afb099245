from dppo_tpu.utils.timer import Timer
from dppo_tpu.utils.scheduler import cosine_warmup_restarts
