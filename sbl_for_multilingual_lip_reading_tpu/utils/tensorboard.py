"""Scalar metric logging to TensorBoard.

The two VSR reference projects log scalars via tensorboardX
(VSR_seq2seq_Transformer_with_phonemes_LRW/train.py:5,54,135-147).  This
wrapper uses tf.summary when TensorFlow is importable and degrades to a
JSONL file writer otherwise, so metric logging never becomes a hard
dependency.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class SummaryWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._tf_writer = None
        self._jsonl = None
        try:
            import tensorflow as tf  # noqa: deferred heavy import
            self._tf = tf
            self._tf_writer = tf.summary.create_file_writer(logdir)
        except Exception:
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tf_writer is not None:
            with self._tf_writer.as_default():
                self._tf.summary.scalar(tag, float(value), step=int(step))
        else:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "time": time.time()}) + "\n")
            self._jsonl.flush()

    def flush(self) -> None:
        if self._tf_writer is not None:
            self._tf_writer.flush()

    def close(self) -> None:
        if self._tf_writer is not None:
            self._tf_writer.close()
        if self._jsonl is not None:
            self._jsonl.close()
