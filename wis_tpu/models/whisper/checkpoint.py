"""Parameter-tree checkpointing.

The reference memory-maps CTranslate2's converted binary format at load
(reference main.py:341-443). Here converted HF checkpoints are cached as
Orbax checkpoints so subsequent server starts restore the exact pytree
(layer-stacked, ready to quantize/shard) without re-running the
safetensors conversion — the TPU-native artifact format, and the same
machinery a training pipeline would hand off from.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

logger = logging.getLogger("wis_tpu")

CONVERTED_SUBDIR = "_converted"


def save_params(params: Dict, path: str) -> bool:
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, params, force=True)
        logger.info("CHECKPOINT: saved params to %s", path)
        return True
    except Exception as e:  # noqa: BLE001
        logger.warning("CHECKPOINT: save failed (%s)", e)
        return False


def load_params(path: str) -> Optional[Dict]:
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    try:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            params = ckptr.restore(path)
        logger.info("CHECKPOINT: restored params from %s", path)
        return params
    except Exception as e:  # noqa: BLE001
        logger.warning("CHECKPOINT: restore failed (%s)", e)
        return None


def converted_path(model_dir: str) -> str:
    return os.path.join(model_dir, CONVERTED_SUBDIR)
