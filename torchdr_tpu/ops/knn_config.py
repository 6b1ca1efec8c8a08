"""kNN tier configuration object.

The structured analog of the reference's ``FaissConfig``
(reference: torchdr/distance/faiss.py:113-221): instead of index types and
probe counts, the TPU tiers are selection mode (exact ``top_k`` vs the
PartialReduce ``approx_min_k`` path), matmul precision, and streaming block
size. Accepted anywhere the estimators take ``knn_mode``/``knn_precision``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class KnnConfig:
    """Tuning for the kNN-graph builder (ops/distance.knn_graph).

    Parameters
    ----------
    mode : {"exact", "approx"}
        "exact" = Flat tier (lax.top_k, 100% recall).
        "approx" = TPU PartialReduce tier (lax.approx_min_k).
    precision : {"highest", "high", "default"}
        MXU matmul precision for the distance gram: exact f32 / 3-pass /
        raw bf16. Measured on 60k×784 k=30: 1.0 / 0.9997 / 0.88 recall.
    recall_target : float
        Recall target for approx mode.
    block_size : int
        Query rows per streamed block.
    """

    mode: str = "exact"
    precision: str = "highest"
    recall_target: float = 0.95
    block_size: int = 1024
    # IVF tier (mode="ivf"): coarse-quantization probe search (ops/ivf.py)
    nprobe: int = 16
    n_clusters: Optional[int] = None  # None → Faiss-style auto_nlist
    #: IVF scan budget in chunk slots (None → sized from nprobe + cell stats)
    budget: Optional[int] = None
    #: IVF merge stage: None → index-aware auto; "approx" | "exact" | "tournament"
    merge: Optional[str] = None
    #: IVF selection margin (survivors kept per query before the output's
    #: first-k). None → auto: re-rank margin when rerank=True, exactly k
    #: when rerank=False. Under rerank=False an explicit small margin is
    #: the recall lever: selection keeps m scan-score survivors and the
    #: output takes the best k, recovering approx_min_k binning losses
    #: without the survivor row gather (1M×128: m=k 99.18% → m=24 99.85%
    #: at +0.5 s, vs re-rank's 99.96% at +0.9 s — _ivf1m_r3f/g.py).
    m: Optional[int] = None
    #: IVF query-block rows (None → the tuned default, 256). ``block_size``
    #: governs the exact/approx tiers only — the IVF probe kernel's block is
    #: a separate MXU-shape knob.
    ivf_block: Optional[int] = None
    #: IVF cell nomination: None → auto (adjacency at nlist ≥ 4096);
    #: "flat" | "adjacency" | "supers"
    nomination: Optional[str] = None
    #: IVF survivor re-rank: False returns scan-score distances directly
    #: (skips the exact f32 re-rank row gather — index-bound on TPU and the
    #: dominant cost of wide-k graph builds: 1.3M×50 k=31 search 42.8 s →
    #: 11.4 s). Scan scores are f32-grade under the default full-fidelity /
    #: high-precision scans (≥99.5% id agreement, ≤2e-3 relative distance
    #: error — regression-tested), which graph building + bandwidth
    #: calibration absorb; hence False HERE (the estimator graph path),
    #: while the raw ``ivf_knn`` API keeps exactness-first rerank=True.
    rerank: bool = False
    #: IVF database storage tier: "auto" (f32, switching to the bf16
    #: residual split past 4 GB) | "f32" | "split" | "int8". "int8" is the
    #: compressed tier — per-cell affine int8 residuals at ¼ the resident
    #: bytes of f32, the TPU-native role of the reference's IVFPQ
    #: (torchdr/distance/faiss.py:113-221) without PQ's gather-bound ADC
    #: scan or its 20-33% recall ceiling.
    storage: str = "auto"

    def __post_init__(self):
        if self.mode not in ("exact", "approx", "ivf"):
            raise ValueError(f"[TorchDR-TPU] unknown knn mode {self.mode!r}")
        if self.precision not in ("highest", "high", "default"):
            raise ValueError(f"[TorchDR-TPU] unknown knn precision {self.precision!r}")
        if self.merge not in (None, "approx", "exact", "tournament"):
            raise ValueError(f"[TorchDR-TPU] unknown ivf merge {self.merge!r}")
        if self.nomination not in (None, "flat", "adjacency", "supers"):
            raise ValueError(
                f"[TorchDR-TPU] unknown ivf nomination {self.nomination!r}"
            )
        if self.storage not in ("auto", "f32", "split", "int8"):
            raise ValueError(
                f"[TorchDR-TPU] unknown ivf storage {self.storage!r}"
            )

    def kwargs(self) -> dict:
        return dict(
            mode=self.mode,
            precision=self.precision,
            recall_target=self.recall_target,
            block_size=self.block_size,
        )


#: Preset: exact Flat tier (default everywhere).
EXACT = KnnConfig()
#: Preset: fast tier — ~99% recall at a fraction of the selection cost.
FAST = KnnConfig(mode="approx", precision="high", recall_target=0.95)
#: Preset: IVF tier — Faiss-IVFFlat role; ~99.9% recall on clustered data.
IVF = KnnConfig(mode="ivf", precision="high")
