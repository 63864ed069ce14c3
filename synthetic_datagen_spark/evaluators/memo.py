"""M12 — cached-baseline protocol: compute-once JSON memo + DataFrame
cache (reference: augmentation_evaluator.py:112-127 memoizes the
baseline MAE in a JSON file keyed by config; ga_optimizer.py:515-535
reuses it across the whole GA run so the expensive baseline trains
once).

The memo key should capture every input that affects the value — the
reference uses the config dict; callers here pass an explicit key.
Idempotent across processes (atomic rename) and cheap to probe.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable


def json_memo(path: str, key: str, compute: Callable[[], dict]) -> dict:
    """Return memo[key], computing and persisting it on first use."""
    memo: dict = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                memo = json.load(f)
        except (json.JSONDecodeError, OSError):
            memo = {}
    if key in memo:
        return memo[key]
    value = compute()
    memo[key] = value
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
    with os.fdopen(fd, "w") as f:
        json.dump(memo, f)
    os.replace(tmp, path)  # atomic: concurrent writers never corrupt
    return value
