"""Scale-aware skew detection + partition autosizing (SURVEY.md §2.8;
fixes the round-1 fixed-threshold sampler: a df-ratio-0.1 term on 10^12
docs is 10^11 postings and MUST be salted even though 0.1 < 0.25)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from indexer_ray.pipelines.build import (
    BuildConfig,
    _auto_partitions,
    _effective_hot_threshold,
    _effective_sample_docs,
    sample_hot_terms,
)


def _write_docs(path, texts):
    pq.write_table(
        pa.table(
            {
                "url": pa.array([f"u://{i}" for i in range(len(texts))]),
                "warc_ts": pa.array([0] * len(texts), type=pa.timestamp("us")),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        path,
    )


def test_mid_head_term_salted_at_scale(tmp_path):
    """A term at sample df-ratio ~0.05 is NOT hot under the 0.25 clamp at
    small N, but IS hot (and heavily salted) when the corpus estimate says
    its expected postings dwarf one run's budget."""
    rng = np.random.default_rng(3)
    texts = []
    for i in range(400):
        parts = [f"fillerterm{i}a", f"fillerterm{i}b"]
        if rng.random() < 0.05:
            parts.append("midheadword")
        texts.append(" ".join(parts))
    p = str(tmp_path / "docs.parquet")
    _write_docs(p, texts)
    cfg = BuildConfig(mode="plain")

    hot_small, _ = sample_hot_terms([p], cfg, n_docs_estimate=400)
    assert "midheadword" not in hot_small  # ratio 0.05 < 0.25 clamp

    hot_big, stats = sample_hot_terms([p], cfg, n_docs_estimate=1_000_000_000)
    assert stats["sampled_docs"] == 400
    assert "midheadword" in hot_big
    # expected postings ~ ratio * 1e9; runs sized to ~2^20 each
    ratio = hot_big["midheadword"] * (1 << 20) / 1e9
    assert 0.01 <= ratio <= 0.12  # n_salts tracks the sampled ratio
    # per-doc-unique filler terms (ratio 1/400 < resolvable floor) stay cold
    assert "fillerterm0a" not in hot_big


def test_effective_threshold_monotonic():
    cfg = BuildConfig()
    # tiny corpus: the configured clamp rules
    assert _effective_hot_threshold(cfg, 1000, 400) == cfg.hot_df_ratio
    # web scale: threshold tracks target/N, floored by sample resolution
    t_big = _effective_hot_threshold(cfg, 10**12, 8192)
    assert t_big == 8.0 / 8192
    t_mid = _effective_hot_threshold(cfg, 10**8, 8192)
    assert t_big <= t_mid <= cfg.hot_df_ratio


def test_effective_sample_scales_with_corpus():
    cfg = BuildConfig()
    assert _effective_sample_docs(cfg, 1000) == cfg.sample_docs
    assert _effective_sample_docs(cfg, 600_000) == 2400
    assert _effective_sample_docs(cfg, 10**12) == 8192


def test_auto_partitions_grows_with_corpus():
    tgt = 4 << 20
    assert _auto_partitions(1_000, tgt) == 32  # floor (the old fixed default)
    p9 = _auto_partitions(10**9, tgt)
    p12 = _auto_partitions(10**12, tgt)
    assert p9 == -(-(10**9) // tgt)
    assert p9 < p12 <= 65536
    # every partition's raw postings fit one encode task
    assert 10**9 / p9 <= tgt


def test_default_config_autosizes_partitions():
    """VERDICT r2 #2: autosizing is the DEFAULT — partition count grows
    linearly with estimated postings unless the caller pins it."""
    cfg = BuildConfig()
    assert cfg.n_partitions is None
    tgt = cfg.target_partition_postings
    assert _auto_partitions(10**6, tgt) == 32  # floor at toy scale
    assert _auto_partitions(1000 * tgt, tgt) == 1000  # linear growth
    assert _auto_partitions(2000 * tgt, tgt) == 2000
    assert _auto_partitions(10**14, tgt) == 65536  # ceiling


def test_distributed_sampler_resolves_df_ratio_1e4(tmp_path, ray_session):
    """VERDICT r2 #3: a df-ratio ~2.5e-4 head term is invisible to the
    8192-doc driver sample but MUST be salted when the corpus estimate says
    its expected postings are ~100x one run's budget — the distributed
    sampler sizes itself to resolve target_run_postings/n_docs_estimate."""
    from indexer_ray.pipelines.build import (
        _required_sample_docs,
        sample_hot_terms_distributed,
    )

    n = 80_000
    texts = ["aaa bbb"] * n
    for i in range(0, 20 * (n // 20), n // 20):  # 20 docs spread evenly
        texts[i] = "aaa bbb qqqzx"
    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array([f"u://{i}" for i in range(n)]),
                "warc_ts": pa.array([0] * n, type=pa.timestamp("us")),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        p,
        row_group_size=5000,
    )
    cfg = BuildConfig(mode="plain")
    n_est = 10**10
    assert _required_sample_docs(cfg, n_est) > 8192  # dispatches distributed
    hot, stats = sample_hot_terms_distributed([p], cfg, n_est)
    assert stats["sampled_docs"] == n
    assert "qqqzx" in hot  # ratio 2.5e-4 resolved and salted
    # expected postings ~2.5e-4 * 1e10 = 2.5e6 -> >=2 runs of ~2^20 each
    assert hot["qqqzx"] >= 2
    assert "aaa" in hot and hot["aaa"] == cfg.max_salts  # df-ratio 1.0 head
    # the sentinel stat rows never leak into the hot set
    assert not any(t.startswith("\x00") for t in hot)
