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
import re
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


# torch.hub convention: filenames may embed a hash prefix as
# ``name-<8+ hex chars>.ext``; load_state_dict_from_url(check_hash=True)
# verifies the sha256 digest starts with it
_HASH_RE = re.compile(r"-([a-f0-9]{8,64})\.")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _verify_or_log(path: str, name: str, progress_fn) -> bool:
    """Integrity-check a downloaded file. If the filename embeds a hash
    fragment (torch.hub convention), require the digest to match; otherwise
    just log the digest so corruption is diagnosable. Returns ok."""
    digest = _sha256(path)
    m = _HASH_RE.search(name)
    if m and not digest.startswith(m.group(1)):
        progress_fn(f"hash mismatch for {name}: file sha256 {digest} does "
                    f"not start with {m.group(1)}")
        return False
    progress_fn(f"checkpoint {name} sha256: {digest}")
    return True


def download_checkpoint(url: str, progress_fn=print) -> str:
    """Fetch ``url`` into the cache (once) and return the local path."""
    name = os.path.basename(urllib.parse.urlparse(url).path) or "checkpoint"
    key = hashlib.sha256(url.encode()).hexdigest()[:16]
    dest = os.path.join(cache_dir(), f"{key}-{name}")
    if os.path.isfile(dest):
        # re-verify hash-named cache entries; drop and re-download corrupt
        # ones instead of trusting the cache forever
        if _HASH_RE.search(name) is None or \
                _verify_or_log(dest, name, progress_fn):
            return dest
        os.unlink(dest)
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
        if not _verify_or_log(tmp, name, progress_fn):
            raise IOError(f"downloaded checkpoint {url} failed its "
                          "embedded-hash integrity check")
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return dest
