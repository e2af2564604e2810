"""Diagnostics for annealing ensembles.

The VA method's core diagnostic is the action-level-vs-β plot over an
ensemble of initializations: minimizers that found the global basin share
a consistent lowest action level (SURVEY.md "What the reference is";
Ye et al., PRE 92 052901 (2015)). The reference leaves this analysis to
user scripts; here it is a library: level clustering, member selection,
and an optional matplotlib rendering of the classic figure.
"""

from typing import NamedTuple, Optional

import numpy as np


class ActionLevels(NamedTuple):
    levels: np.ndarray        # (n_levels,) sorted unique action plateaus
    counts: np.ndarray        # (n_levels,) members per level
    assignment: np.ndarray    # (B,) level index per member
    best_members: np.ndarray  # indices of members at the lowest level


def action_levels(A_final, rel_gap: float = 0.05) -> ActionLevels:
    """Cluster the final (highest-β) action values of an ensemble into
    levels: two members share a level if their actions differ by less than
    ``rel_gap`` relatively. Returns levels sorted ascending.
    """
    A_final = np.asarray(A_final, float)
    order = np.argsort(A_final)
    levels = []
    assignment = np.empty(len(A_final), int)
    for idx in order:
        a = A_final[idx]
        if levels and a <= levels[-1][0] * (1 + rel_gap) + 1e-300:
            levels[-1][1].append(idx)
        else:
            levels.append((a, [idx]))
        assignment[idx] = len(levels) - 1
    lv = np.asarray([l[0] for l in levels])
    counts = np.asarray([len(l[1]) for l in levels])
    return ActionLevels(levels=lv, counts=counts, assignment=assignment,
                        best_members=np.asarray(levels[0][1]))


def estimate_from_ensemble(A, paths_or_final):
    """The VA estimate: the member(s) at the lowest consistent action
    level. ``A``: (B, Nβ) ladders; ``paths_or_final``: (B, ...) per-member
    results. Returns (best_index, selected_result, ActionLevels)."""
    A = np.asarray(A)
    lv = action_levels(A[:, -1])
    best = int(lv.best_members[0])
    return best, np.asarray(paths_or_final)[best], lv


def path_rmse(X_est, X_true, Lidx=None, D=None):
    """RMSE split into observed/unobserved components (twin-experiment
    quality metric). ``Lidx`` observed columns; D total state dim."""
    X_est = np.asarray(X_est)
    X_true = np.asarray(X_true)
    if Lidx is None:
        return float(np.sqrt(np.mean((X_est - X_true) ** 2)))
    Lidx = list(Lidx)
    D = D or X_true.shape[-1]
    unobs = [i for i in range(D) if i not in Lidx]
    out = {
        "observed": float(np.sqrt(np.mean(
            (X_est[..., Lidx] - X_true[..., Lidx]) ** 2))),
    }
    if unobs:
        out["unobserved"] = float(np.sqrt(np.mean(
            (X_est[..., unobs] - X_true[..., unobs]) ** 2)))
    return out


def plot_action_levels(A, beta_array=None, ax=None, fname: Optional[str]
                       = None, log: bool = True):
    """Render the classic action-vs-β ensemble figure. ``A``: (B, Nβ) or
    (Nβ,). Saves to ``fname`` if given; returns the matplotlib Axes."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    A = np.atleast_2d(np.asarray(A))
    beta = (np.arange(A.shape[1]) if beta_array is None
            else np.asarray(beta_array))
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 4))
    for b in range(A.shape[0]):
        ax.plot(beta, A[b], lw=0.7, alpha=min(1.0, 4.0 / A.shape[0]),
                color="C0")
    if log:
        ax.set_yscale("log")
    ax.set_xlabel(r"annealing step $\beta$")
    ax.set_ylabel("action level")
    ax.set_title(f"ensemble action levels (B={A.shape[0]})")
    if fname:
        ax.figure.savefig(fname, dpi=120, bbox_inches="tight")
    return ax
