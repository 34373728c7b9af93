"""Checkpoint/resume via orbax — the ``tf.train.Saver`` replacement.

Reference: per-model ``Saver`` checkpoints, manual resume; PGGAN keeps
per-resolution dirs and restores trunk weights across levels (SURVEY.md §5).
Here: an orbax ``CheckpointManager`` saves the whole ``GANTrainState`` pytree
(params, opt slots, sn u-vectors, BN stats, EMA, step, rng, alpha);
``restore_latest`` gives crash auto-resume. PGGAN cross-level migration is
pytree surgery in ``models/pggan.py``, not a checkpoint concern.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore_latest(self, abstract_state: Any) -> Optional[Any]:
        """Restore the newest checkpoint into the structure of
        ``abstract_state`` (a concrete or jax.eval_shape'd state); None if no
        checkpoint exists."""
        step = self._mngr.latest_step()
        if step is None:
            return None
        return self._mngr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def restore_latest_raw(self) -> Optional[dict]:
        """Restore the newest checkpoint as a raw pytree (dict of arrays),
        without requiring a matching target structure. Use for inference-side
        consumers (sample/evaluate) that only need a subset of the state and
        must not depend on the training run's optimizer layout.

        Cross-platform: a checkpoint written on TPU records device shardings
        that do not resolve in a CPU-only process (and vice versa); when the
        recorded devices are absent, the restore is replayed against
        shape/dtype metadata only, landing the arrays on the default local
        device — evaluating a TPU-trained run on a CPU host is a supported
        workflow, not an error."""
        step = self._mngr.latest_step()
        if step is None:
            return None
        import logging

        class _QuietDeviceNotFound(logging.Filter):
            # orbax error-logs every array's device-not-found before raising
            # one ValueError; during the probe+fallback that is pure noise
            def filter(self, record):
                return "was not found in jax.local_devices" not in record.getMessage()

        quiet = _QuietDeviceNotFound()
        logging.getLogger().addFilter(quiet)
        try:
            try:
                return self._mngr.restore(step,
                                          args=ocp.args.StandardRestore())
            except ValueError as e:
                if "jax.local_devices" not in str(e):
                    raise
                meta = self._mngr.item_metadata(step)
                sharding = jax.sharding.SingleDeviceSharding(
                    jax.local_devices()[0])

                def to_abstract(m):
                    if hasattr(m, "shape") and hasattr(m, "dtype"):
                        return jax.ShapeDtypeStruct(m.shape, m.dtype,
                                                    sharding=sharding)
                    return m

                abstract = jax.tree.map(to_abstract, meta)
                return self._mngr.restore(
                    step, args=ocp.args.StandardRestore(abstract))
        finally:
            logging.getLogger().removeFilter(quiet)

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
