"""Progress logging sinks: simple / json stdout + TensorBoard + W&B + AzureML.

(reference: fairseq/logging/progress_bar.py:28-485 — renderer selected by
--log-format with optional TensorBoard/W&B/AzureML wrappers; the AzureML
wrapper is :440-476.)
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Dict, Optional

logger = logging.getLogger("s2t_tpu")


class ProgressLogger:
    def __init__(
        self,
        log_format: str = "simple",
        tensorboard_logdir: Optional[str] = None,
        wandb_project: Optional[str] = None,
        azureml_logging: bool = False,
    ):
        self.log_format = log_format
        self.tb = None
        if tensorboard_logdir:
            from s2t_tpu.utils.tensorboard import TensorBoardWriter

            self.tb = TensorBoardWriter(tensorboard_logdir, "train")
            self.tb_valid = TensorBoardWriter(tensorboard_logdir, "valid")
        self.wandb = None
        if wandb_project:
            try:
                import wandb

                wandb.init(project=wandb_project, reinit=True)
                self.wandb = wandb
            except ImportError:
                logger.warning("wandb not installed; skipping sink")
        self.azureml = None
        if azureml_logging:
            # reference: progress_bar.py:440-476 AzureMLProgressBarWrapper
            try:
                from azureml.core import Run  # optional

                self.azureml = Run.get_context()
            except ImportError:
                logger.warning("azureml-core not installed; skipping sink")

    def log(self, stats: Dict[str, float], step: int, tag: str = "train",
            epoch: Optional[int] = None):
        if self.log_format == "json":
            print(json.dumps({"step": step, "tag": tag, **{
                k: round(float(v), 5) for k, v in stats.items()
                if isinstance(v, (int, float))
            }}), flush=True)
        elif self.log_format == "simple":
            parts = [f"{k} {float(v):.4g}" for k, v in stats.items()
                     if isinstance(v, (int, float))]
            prefix = f"epoch {epoch} | " if epoch is not None else ""
            logger.info("%s%s | step %d | %s", prefix, tag, step, " | ".join(parts))
        tb = self.tb if tag == "train" else getattr(self, "tb_valid", None)
        if tb is not None:
            tb.add_scalars(stats, step)
        if self.wandb is not None:
            self.wandb.log({f"{tag}/{k}": v for k, v in stats.items()}, step=step)
        if self.azureml is not None:
            for k, v in stats.items():
                if isinstance(v, (int, float)):
                    self.azureml.log(
                        name=f"{tag}/{k}", value=v, description=k
                    )

    def close(self):
        if self.tb is not None:
            self.tb.close()
            self.tb_valid.close()
