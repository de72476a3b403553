from wis_tpu.models.xtts.model import XTTSConfig, XTTSModel

__all__ = ["XTTSModel", "XTTSConfig"]
