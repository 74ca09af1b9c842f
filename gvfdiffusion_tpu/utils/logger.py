"""KV logger with mean accumulation, multi-format output, and profiling
scopes.

Re-design of the reference's OpenAI-baselines-style logger (utils/logger.py:
logkv/logkv_mean/dumpkvs :227-256, output formats :206, profile_kv/@profile
:311-340, configure :463-487). TensorBoard output uses flax's summary writer
when available; JSON/CSV/stdout are dependency-free.
"""

from __future__ import annotations

import contextlib
import csv
import functools
import json
import os
import sys
import time
from collections import defaultdict
from typing import Any, Dict, Optional

DEBUG = 10
INFO = 20
WARN = 30
ERROR = 40
DISABLED = 50


class KVWriter:
    def writekvs(self, kvs: Dict[str, Any]) -> None:
        raise NotImplementedError

    def close(self):
        pass


class HumanOutputFormat(KVWriter):
    def __init__(self, file):
        self.file = file

    def writekvs(self, kvs):
        key2str = {}
        for k, v in sorted(kvs.items()):
            if isinstance(v, float):
                key2str[k] = f"{v:<8.3g}"
            else:
                key2str[k] = str(v)
        if not key2str:
            return
        keywidth = max(map(len, key2str.keys()))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for k, v in sorted(key2str.items()):
            lines.append(f"| {k:<{keywidth}} | {v:<{valwidth}} |")
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()


class JSONOutputFormat(KVWriter):
    def __init__(self, filename):
        self.file = open(filename, "at")

    def writekvs(self, kvs):
        self.file.write(json.dumps({k: float(v) if hasattr(v, "item") else v
                                    for k, v in kvs.items()}) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    def __init__(self, filename):
        self.filename = filename
        self.keys = []

    def writekvs(self, kvs):
        extra = sorted(set(kvs.keys()) - set(self.keys))
        if extra:
            self.keys += extra
            rows = []
            if os.path.exists(self.filename):
                with open(self.filename) as f:
                    rows = list(csv.reader(f))[1:]
            with open(self.filename, "wt", newline="") as f:
                w = csv.writer(f)
                w.writerow(self.keys)
                for r in rows:
                    w.writerow(r + [""] * (len(self.keys) - len(r)))
        with open(self.filename, "at", newline="") as f:
            csv.writer(f).writerow([kvs.get(k, "") for k in self.keys])


class TensorBoardOutputFormat(KVWriter):
    def __init__(self, log_dir):
        from flax.metrics import tensorboard

        self.writer = tensorboard.SummaryWriter(log_dir)
        self.step = 0

    def writekvs(self, kvs):
        step = int(kvs.get("step", self.step))
        for k, v in kvs.items():
            try:
                self.writer.scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass
        self.step = step + 1
        self.writer.flush()


def make_output_format(fmt: str, ev_dir: str, log_suffix: str = "") -> KVWriter:
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(open(os.path.join(ev_dir, f"log{log_suffix}.txt"), "at"))
    if fmt == "json":
        return JSONOutputFormat(os.path.join(ev_dir, f"progress{log_suffix}.json"))
    if fmt == "csv":
        return CSVOutputFormat(os.path.join(ev_dir, f"progress{log_suffix}.csv"))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(os.path.join(ev_dir, f"tb{log_suffix}"))
    raise ValueError(f"Unknown format {fmt}")


class Logger:
    CURRENT: Optional["Logger"] = None

    def __init__(self, dir: Optional[str], output_formats):
        self.name2val: Dict[str, Any] = defaultdict(float)
        self.name2cnt: Dict[str, int] = defaultdict(int)
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        oldval, cnt = self.name2val[key], self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + val / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        d = dict(self.name2val)
        for fmt in self.output_formats:
            fmt.writekvs(d)
        self.name2val.clear()
        self.name2cnt.clear()
        return d

    def log(self, *args, level=INFO):
        if self.level <= level:
            print(*args, file=sys.stderr)

    def close(self):
        for f in self.output_formats:
            f.close()


def configure(dir: Optional[str] = None, format_strs=None, log_suffix=""):
    """Set up the global logger (reference utils/logger.py:463-487)."""
    if dir is None:
        dir = os.environ.get("LOGDIR") or os.path.join(
            "/tmp", f"gvf-{time.strftime('%Y-%m-%d-%H-%M-%S')}"
        )
    os.makedirs(dir, exist_ok=True)
    if format_strs is None:
        format_strs = os.environ.get("GVF_LOG_FORMAT", "stdout,log,csv").split(",")
    output_formats = [make_output_format(f, dir, log_suffix) for f in format_strs if f]
    Logger.CURRENT = Logger(dir=dir, output_formats=output_formats)
    return Logger.CURRENT


def get_current() -> Logger:
    if Logger.CURRENT is None:
        configure()
    return Logger.CURRENT


def logkv(key, val):
    get_current().logkv(key, val)


def logkv_mean(key, val):
    get_current().logkv_mean(key, val)


def logkvs(d):
    for k, v in d.items():
        logkv(k, v)


def dumpkvs():
    return get_current().dumpkvs()


def log(*args, **kw):
    get_current().log(*args, **kw)


def get_dir():
    return get_current().dir


@contextlib.contextmanager
def profile_kv(scopename: str):
    """Accumulate wall time under wait_<name> (reference :311-327)."""
    logkey = "wait_" + scopename
    tstart = time.time()
    try:
        yield
    finally:
        get_current().name2val[logkey] += time.time() - tstart


def profile(n: str):
    """Decorator form of profile_kv (reference :330-340)."""

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            with profile_kv(n):
                return func(*args, **kwargs)

        return wrapper

    return decorator


def save_args(args, dir=None):
    """Snapshot run arguments as JSON (reference :295-308)."""
    dir = dir or get_dir()
    d = vars(args) if hasattr(args, "__dict__") else dict(args)
    with open(os.path.join(dir, "args.json"), "w") as f:
        json.dump({k: repr(v) for k, v in d.items()}, f, indent=2)
