"""The reference's shipped config corpus loads VERBATIM.

A user of the reference (RManLuo/MAMDR) must be able to point this framework
at their existing config/<bench>/*.json files unchanged — load_config maps
every key of the reference schema (run.py:25-40 json.load consumers) onto
the typed dataclasses. Skipped when the read-only reference checkout is not
present (CI outside this environment).
"""

from __future__ import annotations

import glob
import os.path as osp

import pytest

REF = "/root/reference/config"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF), reason="reference checkout not available"
)


def _corpus():
    return sorted(glob.glob(osp.join(REF, "**", "*.json"), recursive=True))


def test_corpus_is_present_and_sized():
    # 5 benchmark dirs, 40 configs total (7+7+12+7+7)
    assert len(_corpus()) == 40


@pytest.mark.parametrize("path", _corpus(), ids=lambda p: "/".join(p.split("/")[-2:]))
def test_reference_config_loads_verbatim(path):
    from mamdr_tpu.config import load_config

    cfg = load_config(path)
    # the three sections all bound and typed
    assert cfg.model.name
    assert cfg.train.patience >= 1
    assert cfg.dataset.batch_size >= 1
    # strategy dispatch accepts the model name (reference run.py:37-65
    # substring rules)
    from mamdr_tpu.config import parse_model_name

    spec = parse_model_name(cfg.model.name)
    assert spec.base and spec.strategy
