"""Run-provenance source snapshot.

The reference copies its core source files into ``<model_dir>/files/`` at
Trainer construction so every run is reproducible from its checkpoint dir
(reference train.py:60-66). Here the whole package source tree + the
repo-root entry scripts are snapshotted, plus a MANIFEST recording the git
SHA and the library versions the run actually used.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
import subprocess


def _git_sha(repo_dir: str):
    try:
        out = subprocess.run(
            ['git', '-C', repo_dir, 'rev-parse', 'HEAD'],
            capture_output=True, text=True, timeout=10)
        return out.stdout.strip() or None
    except Exception:
        return None


def _versions():
    vers = {}
    for mod in ('jax', 'jaxlib', 'flax', 'optax', 'orbax.checkpoint',
                'numpy'):
        try:
            m = __import__(mod)
            for part in mod.split('.')[1:]:
                m = getattr(m, part)
            vers[mod] = getattr(m, '__version__', 'unknown')
        except Exception:
            pass
    return vers


def snapshot_sources(dest_dir: str):
    """Copy the package source + entry scripts into ``dest_dir`` and write
    MANIFEST.json. Idempotent; failures never block training."""
    import keypointfusion_tpu
    pkg_dir = osp.dirname(osp.abspath(keypointfusion_tpu.__file__))
    repo_dir = osp.dirname(pkg_dir)
    os.makedirs(dest_dir, exist_ok=True)
    try:
        for root, _dirs, files in os.walk(pkg_dir):
            rel = osp.relpath(root, pkg_dir)
            for f in files:
                if not f.endswith(('.py', '.cc', '.h')):
                    continue
                out = osp.join(dest_dir, 'keypointfusion_tpu', rel, f)
                os.makedirs(osp.dirname(out), exist_ok=True)
                shutil.copy2(osp.join(root, f), out)
        for entry in ('train.py', 'demo_RGBD.py', 'bench.py'):
            src = osp.join(repo_dir, entry)
            if osp.isfile(src):
                shutil.copy2(src, osp.join(dest_dir, entry))
        with open(osp.join(dest_dir, 'MANIFEST.json'), 'w') as f:
            json.dump({'git_sha': _git_sha(repo_dir),
                       'versions': _versions()}, f, indent=1)
    except OSError:
        pass
