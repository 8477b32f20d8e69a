"""One-sided epoch-cap resolution of the ordering checks (round 5).

Under the reference's strict-improvement early stop, a row's recorded AUC
only rises with more epochs, so a capped row on the WINNING side of a check
cannot flip the verdict — only capped losers leave a check unresolved
(scripts/render_results.ordering_checks; scripts/requeue_unresolved.py
reruns exactly that set uncapped)."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "scripts"))

from render_results import ordering_checks  # noqa: E402


def row(auc, capped=False, ft=None):
    e = {"test": {"avg_auc": auc}, "early_stopped": not capped,
         "epoch_cap": 100}
    if ft is not None:
        e["finetune"] = {"avg_auc": ft}
    return e


def render(rows):
    unresolved = []
    lines = ordering_checks(rows, collect_unresolved=unresolved)
    return lines, set(unresolved)


def test_capped_winner_resolves():
    # joint capped but WINNING the DN>joint FAIL: more epochs only widen it
    rows = {
        "mlp": row(0.80, capped=True),
        "mlp_meta_domain_negotiation_finetune": row(0.77, ft=0.78),
    }
    lines, unresolved = render(rows)
    (dn_line,) = [l for l in lines if "DN > joint" in l]
    assert "FAIL" in dn_line
    assert "unresolved" not in dn_line
    assert "verdict stands" in dn_line
    assert unresolved == set()


def test_capped_loser_unresolved():
    # DN capped and LOSING: more epochs could flip the verdict
    rows = {
        "mlp": row(0.80),
        "mlp_meta_domain_negotiation_finetune": row(0.77, capped=True,
                                                    ft=0.78),
    }
    lines, unresolved = render(rows)
    (dn_line,) = [l for l in lines if "DN > joint" in l]
    assert "FAIL" in dn_line and "unresolved" in dn_line
    assert unresolved == {"mlp_meta_domain_negotiation_finetune"}


def test_capped_winner_of_pass_resolves():
    # MAMDR capped while PASSING vs a converged joint: PASS stands
    rows = {
        "mlp": row(0.75),
        "mlp_meta_mamdr_finetune": row(0.80, capped=True, ft=0.81),
    }
    lines, unresolved = render(rows)
    (line,) = [l for l in lines if "MAMDR > joint" in l]
    assert "PASS" in line and "unresolved" not in line
    assert unresolved == set()


def test_mtl_one_sided():
    # FAIL vs a capped MMoE with MAMDR converged: resolved FAIL (MMoE can
    # only rise further above), but a capped MAMDR would leave it open
    base = {
        "mmoe": row(0.86, capped=True),
        "ple": row(0.80),
        "shared_bottom": row(0.79),
    }
    rows = dict(base, mlp_meta_mamdr_finetune=row(0.84, ft=0.845))
    lines, unresolved = render(rows)
    (line,) = [l for l in lines if "MTL baselines" in l]
    assert "FAIL" in line and "unresolved" not in line
    assert unresolved == set()

    rows = dict(base,
                mlp_meta_mamdr_finetune=row(0.84, capped=True, ft=0.845))
    lines, unresolved = render(rows)
    (line,) = [l for l in lines if "MTL baselines" in l]
    assert "FAIL" in line and "unresolved" in line
    assert unresolved == {"mlp_meta_mamdr_finetune"}
