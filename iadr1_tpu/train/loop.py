"""SFT training loop: data -> jit step -> logging -> checkpoints.

The loop layer of the PA-SFT stage (reference: run_sft workflow,
llamafactory/train/sft/workflow.py:40-132, with LogCallback-style jsonl
logging and ETA, train/callbacks.py:179-348).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Iterable, Sequence

import numpy as np


@dataclasses.dataclass
class LoopConfig:
    output_dir: str = "output"
    max_steps: int = 100
    batch_size: int = 8               # global batch (rows per step)
    logging_steps: int = 10
    save_steps: int = 0               # 0 = only final
    seed: int = 0
    keep_checkpoints: int = 3
    resume: bool = False              # auto-resume from the latest checkpoint
    # (reference: trainer.train(resume_from_checkpoint=...),
    # train/sft/workflow.py:101)
    plot_loss: bool = False           # render training_loss.png at the end
    report_to: list = dataclasses.field(default_factory=list)  # e.g. ["wandb"]
    # background host-collation prefetch depth (0 = synchronous); the
    # torch-DataLoader-workers analogue (prefetch_iterator below)
    prefetch: int = 2


class JsonlLogger:
    """trainer_log.jsonl-compatible progress log (+ stdout)."""

    def __init__(self, output_dir: str, total_steps: int):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "trainer_log.jsonl")
        self.total = total_steps
        self.start = time.time()
        self._f = open(self.path, "a")

    def log(self, step: int, metrics: dict):
        elapsed = time.time() - self.start
        rate = elapsed / max(step, 1)
        record = {
            "current_steps": step,
            "total_steps": self.total,
            "percentage": round(step / self.total * 100, 2),
            "elapsed_time": round(elapsed, 1),
            "remaining_time": round(rate * (self.total - step), 1),
            **{k: (round(float(v), 6) if np.isscalar(v) or getattr(v, "ndim", 1) == 0 else v)
               for k, v in metrics.items()},
        }
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()
        print(f"[step {step}/{self.total}] " + " ".join(
            f"{k}={record[k]}" for k in metrics
        ))

    def close(self):
        self._f.close()


def batch_iterator(rows: Sequence[dict], batch_size: int, seed: int,
                   collate: Callable, skip: int = 0) -> Iterable[dict]:
    """Infinite shuffled epochs over packed rows.

    ``skip`` fast-forwards the deterministic batch stream past the first N
    batches without collating them -- the data-cursor restore for resumed
    runs (batch k after skip=N equals batch N+k of a fresh iterator).
    """
    if len(rows) < batch_size:
        raise ValueError(
            f"{len(rows)} packed rows < batch_size {batch_size}; an empty "
            "iterator would spin forever"
        )
    rng = np.random.default_rng(seed)
    order = np.arange(len(rows))
    skipped = 0
    while True:
        rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            if skipped < skip:
                skipped += 1
                continue
            yield collate([rows[j] for j in order[i : i + batch_size]])


def prefetch_iterator(batches: Iterable[dict], depth: int = 2):
    """Background-thread prefetch over a batch iterable.

    The torch-DataLoader-workers analogue (the reference's preprocessing
    parallelism, hparams preprocessing_num_workers): host-side collation
    (tokenize/pack/image index plans) overlaps the device step instead of
    serializing with it -- on this machine's single CPU core the host work
    otherwise adds directly to step time.  Order-preserving; exceptions
    (incl. StopIteration) propagate to the consumer; the thread is a
    daemon so abandoned iterators cannot hang interpreter exit.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    _END = object()

    def worker():
        try:
            for item in batches:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 -- re-raised by consumer
            q.put((_END, e))
            return
        q.put((_END, None))

    threading.Thread(target=worker, daemon=True).start()

    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _END:
            if item[1] is not None:
                raise item[1]
            return
        yield item


def run_sft_loop(
    state,
    step_fn,
    batches: Iterable[dict],
    cfg: LoopConfig,
    checkpoint_manager=None,
    meter=None,
    start_step: int = 0,
):
    """Drive training for cfg.max_steps; returns (final_state, history).

    ``start_step``: resume point -- steps start at start_step+1 and the
    caller is responsible for fast-forwarding ``batches`` (batch_iterator
    skip=start_step) and restoring ``state`` from the checkpoint.
    """
    logger = JsonlLogger(cfg.output_dir, cfg.max_steps)
    from iadr1_tpu.train.reporters import make_reporters

    reporter = make_reporters(cfg.report_to)
    history = []
    if cfg.prefetch:
        batches = prefetch_iterator(batches, cfg.prefetch)
    it = iter(batches)
    t_last = time.perf_counter()
    for step in range(start_step + 1, cfg.max_steps + 1):
        batch = next(it)
        state, metrics = step_fn(state, batch)
        if meter is not None or step % max(cfg.logging_steps, 1) == 0:
            # scalar fetch: the only reliable sync point on the tunneled TPU
            float(metrics["loss"])
            now = time.perf_counter()
            if meter is not None:
                n_tok = int(np.prod(np.shape(batch["input_ids"])))
                meter.update(n_tok, now - t_last)
            t_last = now
        if step % max(cfg.logging_steps, 1) == 0:
            out = {k: float(v) for k, v in metrics.items()}
            if meter is not None:
                out["tokens_per_sec_per_chip"] = meter.tokens_per_sec_per_chip
                out["mfu"] = meter.mfu
            logger.log(step, out)
            reporter.log(step, out)
            history.append(out)
        if checkpoint_manager is not None and cfg.save_steps and step % cfg.save_steps == 0:
            checkpoint_manager.save(step, state)
    if checkpoint_manager is not None:
        checkpoint_manager.save(cfg.max_steps, state)
        checkpoint_manager.wait()
    logger.close()
    reporter.finish()
    if cfg.plot_loss:
        from iadr1_tpu.train.reporters import plot_loss

        plot_loss(cfg.output_dir)
    return state, history
