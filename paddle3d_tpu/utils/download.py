"""Download with cache (reference: paddle3d/utils/download.py:22,39).

This image has no network egress; downloads resolve only from the local
cache, with a clear error otherwise.
"""
import hashlib
import os

from ..env import PRETRAINED_HOME
from .logger import logger

__all__ = ["download_with_cache"]


def download_with_cache(url: str, cache_dir: str = None) -> str:
    cache_dir = cache_dir or PRETRAINED_HOME
    os.makedirs(cache_dir, exist_ok=True)
    fname = hashlib.md5(url.encode()).hexdigest()[:12] + "_" + \
        os.path.basename(url)
    path = os.path.join(cache_dir, fname)
    if os.path.exists(path):
        return path
    try:
        import urllib.request
        logger.info("Downloading {}".format(url))
        urllib.request.urlretrieve(url, path)
        return path
    except Exception as e:
        raise RuntimeError(
            "Cannot download {} (no egress in this environment). Place the "
            "file at {} manually.".format(url, path)) from e
