from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from .hooks import RuntimeSchedule
