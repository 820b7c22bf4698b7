"""Structured metrics writer (SURVEY.md §5.5).

The reference logs via prints and matplotlib artifacts; here every train
step's metrics dict can also stream to a CSV (easily picked up by TensorBoard
ingestion or pandas), keeping the loss-breakdown/percent-share report and
codebook-health counters first-class.
"""
from __future__ import annotations

import csv
import os
import time
from typing import Mapping, Optional


class MetricsWriter:
    """Append-only CSV metrics log with a stable, growable column set."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fields: list[str] = ["step", "time"]
        self._rows_buffered: list[dict] = []

    def write(self, step: int, metrics: Mapping[str, float]):
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        for k in row:
            if k not in self._fields:
                self._fields.append(k)
        self._rows_buffered.append(row)
        if len(self._rows_buffered) >= 20:
            self.flush()

    def flush(self):
        if not self._rows_buffered:
            return
        exists = os.path.exists(self.path)
        # rewrite whole file if the field set grew beyond the header on disk
        # — ATOMICALLY (temp + rename): a kill mid-rewrite must not truncate
        # the accumulated trajectory (it did, once — a resumed GAN campaign
        # lost its first 1.1k steps of in-loop evals).
        if exists:
            with open(self.path, "r", newline="") as f:
                reader = csv.DictReader(f)
                old_fields = reader.fieldnames or []
                grew = bool(set(self._fields) - set(old_fields))
                # ALWAYS adopt the on-disk column order (a resumed process
                # starts with a fresh, possibly smaller/reordered field set;
                # appending in its own order would misalign columns)
                self._fields = list(old_fields) + [
                    k for k in self._fields if k not in old_fields
                ]
                if grew:
                    rows = list(reader)
                    tmp = self.path + ".tmp"
                    with open(tmp, "w", newline="") as fw:
                        writer = csv.DictWriter(fw, fieldnames=self._fields, restval="")
                        writer.writeheader()
                        writer.writerows(rows)
                        writer.writerows(self._rows_buffered)
                    os.replace(tmp, self.path)
                    self._rows_buffered.clear()
                    return
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fields, restval="")
            if not exists:
                writer.writeheader()
            writer.writerows(self._rows_buffered)
        self._rows_buffered.clear()

    def close(self):
        self.flush()
