"""URL checkpoint fetch with a local cache.

Rebuilds the reference's torch.hub URL resume (/root/reference/
main_vg.py:307-309: ``torch.hub.load_state_dict_from_url(args.resume, ...)``
for ``https://`` resumes) — the released RefTR checkpoints are distributed
as URLs (reference README.md:86-91). Downloads land in
``$REFTR_CACHE_DIR`` (default ``~/.cache/reftr_tpu/checkpoints``) keyed by
a URL hash + basename, so repeated runs reuse the file, matching
torch.hub's cache behavior.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import urllib.parse
import urllib.request


def cache_dir() -> str:
    return os.environ.get(
        "REFTR_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "reftr_tpu",
                     "checkpoints"))


def is_url(path: str) -> bool:
    return path.startswith(("http://", "https://"))


def download_checkpoint(url: str, progress_fn=print) -> str:
    """Fetch ``url`` into the cache (once) and return the local path."""
    name = os.path.basename(urllib.parse.urlparse(url).path) or "checkpoint"
    key = hashlib.sha256(url.encode()).hexdigest()[:16]
    dest = os.path.join(cache_dir(), f"{key}-{name}")
    if os.path.isfile(dest):
        return dest
    os.makedirs(cache_dir(), exist_ok=True)
    progress_fn(f"Downloading checkpoint {url} -> {dest}")
    # download to a temp file then atomic-rename, so a killed run never
    # leaves a truncated file that a later run would trust
    fd, tmp = tempfile.mkstemp(dir=cache_dir(), suffix=".part")
    os.close(fd)
    try:
        # per-read socket timeout (not a whole-download cap): a dead server
        # fails in a minute instead of hanging the resume forever
        with urllib.request.urlopen(url, timeout=60) as r, \
                open(tmp, "wb") as f:
            shutil.copyfileobj(r, f)
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return dest
