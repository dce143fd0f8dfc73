from .timer import TickTimer, tick_ms
from .metrics import psnr, ssim

__all__ = ["TickTimer", "tick_ms", "psnr", "ssim"]
