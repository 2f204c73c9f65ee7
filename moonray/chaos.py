"""IO-level fault injection + the retry layer that absorbs it.

The reference wraps its filesystem accessor in a chaos layer that
injects delays and errors below a retrying accessor
(filesystem_accessor_chaos_wrapper.rs + accessor_config.rs); CI runs
the real pipelines through it. moonray's analogue:

- a table root opts in by carrying a ``CHAOS.json`` file::

      {"seed": 7, "read_error_prob": 0.3, "write_error_prob": 0.3,
       "partial_fetch_prob": 0.3, "delay_ms": [0, 3]}

  Workers discover it through the same (root, rel) accessor calls
  they already make — no env plumbing, and a root either has chaos
  from birth or never (the per-process config cache assumes that).
- faults are DETERMINISTIC per (seed, op, rel): a path either fails
  its first attempt and then succeeds forever, or never fails —
  seeded hash, no RNG state. That keeps chaos runs reproducible and
  guarantees convergence under bounded retries.
- ``with_io_retries`` is the absorbing layer (accessor_config.rs's
  retry): bounded attempts + exponential backoff, retrying OSErrors
  EXCEPT the control-flow ones (FileNotFoundError & friends are
  protocol answers in this codebase, not transients).

Injection points: filecache.data_path (read plane), FileCache.get's
remote fetch (partial-fetch truncation → refetch), storage.publish_file
and commitstore put/put_if_absent (write plane). Every injected fault
appends a line to ``<root>/chaos.log`` so tests can assert chaos
actually fired across worker processes.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time

_CONFIGS: dict[str, dict | None] = {}
_ATTEMPTS: dict[tuple[str, str], int] = {}
_LOCK = threading.Lock()

_NON_TRANSIENT = (FileNotFoundError, IsADirectoryError,
                  NotADirectoryError, PermissionError)


def config_for(root: str) -> dict | None:
    """The root's chaos config, or None. Cached per process."""
    c = _CONFIGS.get(root)
    if c is not None or root in _CONFIGS:
        return c
    cfg = None
    # mock:// roots resolve to a local dir (test double for S3); other
    # remote schemes resolve to the shared scratch dir — so every
    # remote plane (fetch, publish, commit) is chaos-able
    p = os.path.join(_local_dir(root), "CHAOS.json")
    try:
        with open(p) as f:
            cfg = json.load(f)
    except (FileNotFoundError, NotADirectoryError, ValueError, OSError):
        cfg = None
    _CONFIGS[root] = cfg
    return cfg


def _decide(cfg: dict, op: str, rel: str, prob_key: str) -> bool:
    prob = float(cfg.get(prob_key, 0.0))
    if prob <= 0:
        return False
    h = int.from_bytes(hashlib.blake2b(
        f"{cfg.get('seed', 0)}|{op}|{rel}".encode(),
        digest_size=8).digest(), "little")
    return (h % 1000) < prob * 1000


def _local_dir(root: str) -> str:
    """Where a root's CHAOS.json + chaos.log live: mock:// resolves to
    its backing dir; other remote schemes (e.g. the HTTP object store)
    use the table's shared scratch dir — visible to every worker, the
    same plane the shuffle run files ride."""
    if root.startswith("mock://"):
        return root[len("mock://"):]
    if "://" in root:
        from moonray.storage import scratch_for

        return scratch_for(root)
    return root


def _log(root: str, line: str) -> None:
    try:
        with open(os.path.join(_local_dir(root), "chaos.log"), "a") as f:
            f.write(line + "\n")
    except OSError:
        pass


def _delay(cfg: dict, op: str, rel: str) -> None:
    lo, hi = cfg.get("delay_ms", [0, 0])
    if hi <= 0:
        return
    h = int.from_bytes(hashlib.blake2b(
        f"d|{cfg.get('seed', 0)}|{op}|{rel}".encode(),
        digest_size=4).digest(), "little")
    time.sleep((lo + (h % max(1, int(hi - lo + 1)))) / 1000.0)


def maybe_fault(root: str, rel: str, op: str) -> None:
    """Delay, then raise a transient OSError on the FIRST attempt of a
    (seeded-ly) chosen (op, rel) — later attempts always pass."""
    cfg = config_for(root)
    if not cfg:
        return
    _delay(cfg, op, rel)
    if not _decide(cfg, op, rel, f"{op}_error_prob"):
        return
    key = (op, rel)
    with _LOCK:
        n = _ATTEMPTS.get(key, 0)
        _ATTEMPTS[key] = n + 1
    if n == 0:
        _log(root, f"{op}_error {rel}")
        raise OSError(f"chaos: injected transient {op} error for {rel}")


def maybe_partial_fetch(root: str, rel: str, tmp: str) -> None:
    """Simulate a partial remote read: truncate the fetched bytes and
    raise — the retrying fetcher must throw the torn copy away and
    refetch (first attempt only, per seeded decision)."""
    cfg = config_for(root)
    if not cfg:
        return
    if not _decide(cfg, "fetch", rel, "partial_fetch_prob"):
        return
    key = ("fetch", rel)
    with _LOCK:
        n = _ATTEMPTS.get(key, 0)
        _ATTEMPTS[key] = n + 1
    if n == 0:
        try:
            size = os.path.getsize(tmp)
            with open(tmp, "r+b") as f:
                f.truncate(max(0, size // 2))
        except OSError:
            pass
        _log(root, f"partial_fetch {rel}")
        raise OSError(f"chaos: partial fetch of {rel}")


def with_io_retries(fn, *, attempts: int = 3, base_delay: float = 0.02):
    """Bounded-retry absorber for transient IO faults (the
    accessor_config.rs retry layer). Control-flow OSErrors
    (FileNotFoundError etc.) propagate immediately — they are protocol
    answers here, not transients."""
    for i in range(attempts):
        try:
            return fn()
        except _NON_TRANSIENT:
            raise
        except OSError:
            if i == attempts - 1:
                raise
            time.sleep(base_delay * (2 ** i))


def reset_for_tests() -> None:
    with _LOCK:
        _CONFIGS.clear()
        _ATTEMPTS.clear()


def fired_count(root: str) -> int:
    """How many faults fired for this root, across ALL processes (the
    chaos.log line count)."""
    try:
        with open(os.path.join(_local_dir(root), "chaos.log")) as f:
            return sum(1 for _ in f)
    except FileNotFoundError:
        return 0
