"""Reference-shaped user API: Extractor / Process over DataFrames.

A user of ExtractThinker writes (tests/test_process.py:66-161 shape):

    process = Process()
    process.load_document_loader(loader)
    process.load_file(path).split(classifications, SplitStrategy.LAZY)
           .extract()

The Spark-native twin keeps the same vocabulary but every argument and
result is a DataFrame, so the same program runs on 10^12 documents:

    proc = Process(classifications)
    result = proc.load(corpus_df).split(SplitStrategy.LAZY).extract()

Classifications carry (name, patterns, contract) exactly like
models/classification.py:6-17; omitted → the built-in registry. The
facade is thin by design: each method delegates to the operator
modules, so the plan is identical to composing them by hand.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from extractthinker_spark.contracts import (
    CLASS_RULES,
    CONTRACT_FIELDS,
    CONTRACT_LIST_FIELDS,
)
from extractthinker_spark.operators.classify import classify_keyword
from extractthinker_spark.operators.extract import extract_fields, paginate_extract
from extractthinker_spark.operators.split import (
    pages_from_documents,
    split_eager,
    split_lazy,
    split_lazy_pages,
)
from extractthinker_spark.plans.pipeline import doc_text, extract_main_content


class SplitStrategy(str, Enum):
    LAZY = "lazy"
    EAGER = "eager"


class CompletionStrategy(str, Enum):
    FORBIDDEN = "forbidden"   # whole-document extraction
    PAGINATE = "paginate"     # per-page partial + merge


class ClassificationStrategy(str, Enum):
    """process.py:95-125 gates, applied per extractor layer."""

    CONSENSUS = "consensus"
    HIGHER_ORDER = "higher_order"
    CONSENSUS_WITH_THRESHOLD = "consensus_with_threshold"


@dataclass
class Classification:
    """Registry entry — models/classification.py:6-17 shape with the
    LLM judgment replaced by deterministic patterns.

    ``extraction_contract``, when set, takes precedence over
    ``contract`` at extraction time (process.py:249-262: a group's
    extractor uses ``extraction_contract or contract``) — classify with
    a cheap discriminating contract, extract with a richer one.
    ``uuid`` identifies the entry in tree classification
    (process.py:169-181 matches nodes by uuid, names may repeat);
    defaults to the name."""

    name: str
    description: str = ""
    patterns: list[str] = field(default_factory=list)
    contract: dict[str, str] | None = None        # field -> regex(group 1)
    list_contract: dict[str, str] | None = None
    extraction_contract: dict[str, str] | None = None
    uuid: str = ""

    def __post_init__(self) -> None:
        if not self.uuid:
            self.uuid = self.name


def default_classifications() -> list[Classification]:
    return [
        Classification(
            name=n,
            patterns=list(p),
            contract=CONTRACT_FIELDS.get(n),
            list_contract=CONTRACT_LIST_FIELDS.get(n),
        )
        for n, p in CLASS_RULES
    ]


class Extractor:
    """Single-document-path operations (reference Extractor).

    ``scorer`` picks this extractor's deterministic judgment
    ('keyword' | 'header' | 'fields') — the stand-in for the
    reference's per-extractor LLM choice when extractors are layered
    for consensus classification."""

    def __init__(
        self,
        classifications: list[Classification] | None = None,
        scorer: str = "keyword",
    ):
        self.classifications = classifications or default_classifications()
        self.scorer = scorer

    def _score(self, text: Column) -> Column:
        from extractthinker_spark.operators.classify import (
            classify_fields,
            classify_header,
        )

        if self.scorer == "header":
            return classify_header(text, self._rules())
        if self.scorer == "fields":
            return classify_fields(text, self._contracts())
        return classify_keyword(text, self._rules())

    def _rules(self) -> list[tuple[str, list[str]]]:
        return [(c.name, c.patterns) for c in self.classifications]

    def _contracts(self) -> dict[str, dict[str, str]]:
        """name -> scalar-field registry, honoring the reference's
        ``extraction_contract or contract`` precedence."""
        return {
            c.name: (c.extraction_contract or c.contract)
            for c in self.classifications
            if (c.extraction_contract or c.contract)
        }

    def _list_contracts(self) -> dict[str, dict[str, str]]:
        return {
            c.name: c.list_contract
            for c in self.classifications
            if c.list_contract
        }

    def classify(self, df: DataFrame, text_col: str = "content") -> DataFrame:
        """+ (classification, confidence) columns — extractor.py:722-772
        semantics (name match-back is by construction exact here)."""
        res = classify_keyword(F.col(text_col), self._rules())
        return df.withColumn("classification", res["name"]).withColumn(
            "confidence", res["confidence"]
        )

    def extract(
        self, df: DataFrame, text_col: str = "content",
        keys: list[str] | None = None,
    ) -> DataFrame:
        """Long-format (key, contract, field, value) extraction for rows
        already carrying a ``classification`` column — against THIS
        extractor's registry, not the built-ins."""
        return extract_fields(
            df, text_col=text_col, keys=keys,
            contracts=self._contracts(),
            list_contracts=self._list_contracts(),
        )


class Process:
    """Multi-document pipeline: load → split → classify → extract
    (process.py:205-309 shape, DataFrame-native)."""

    def __init__(self, classifications: list[Classification] | None = None):
        self.extractor = Extractor(classifications)
        self._documents: DataFrame | None = None
        self._grouped: DataFrame | None = None
        self._layers: list[list[Extractor]] = []

    def add_classify_extractor(
        self, layers: list[list[Extractor]]
    ) -> Process:
        """Extractor layers for strategy classification — the
        reference's process.add_classify_extractor (process.py:65-72):
        each inner list is one layer; layers are tried in order until a
        strategy gate passes."""
        self._layers = layers
        return self

    # -- loading ------------------------------------------------------------

    def load(self, documents: DataFrame) -> Process:
        """documents(doc_id, spans) — the corpus table IS the loader."""
        self._documents = documents
        return self

    def load_raw(
        self,
        raw_docs: DataFrame,
        raw_col: str = "raw",
        uri_col: str | None = None,
    ) -> Process:
        """documents(doc_id, raw: binary) — sniff + decode into spans
        first (operators/rawbytes.py), then proceed as load(). The
        road in for corpora that arrive as file bytes (the reference's
        loader.load(path) entry, document_loader.py:84-87).
        ``uri_col`` forwards a source-path column whose extension
        disambiguates text payloads (csv/tsv) and gz inner content —
        the reference's extension-first dispatch."""
        from extractthinker_spark.operators.rawbytes import parse_raw_bytes

        self._documents = parse_raw_bytes(
            raw_docs, raw_col=raw_col, uri_col=uri_col
        ).select("doc_id", "spans")
        return self

    def extract_content(self, nest: bool = True) -> DataFrame:
        """The parse stage alone (loader equivalent): per-kind span
        transforms (HTML strip, page-header strip, marker replace)."""
        return extract_main_content(self._require_docs(), nest=nest)

    def filter_quality(
        self, thresholds: dict | None = None, keep_rejects: bool = False
    ) -> Process:
        """Corpus-curation gate: run the Gopher quality filter over
        each document's EXTRACTED main text and drop failing documents
        from this process (``keep_rejects=True`` keeps them). Either
        way the full verdict DataFrame — per-doc features, ``keep``,
        ``reject_reason`` — is stashed as ``self.quality_report`` for
        inspection/audit sinks. The filter sees stripped content, not
        raw spans — boilerplate must not count toward
        repetition/stopword signals, just as classification scores
        stripped text."""
        from extractthinker_spark.functions.textstats import gopher_filter

        merged = doc_text(self.extract_content(nest=True))
        verdict = gopher_filter(
            merged.select("doc_id", F.col("content").alias("text")),
            thresholds=thresholds,
        )
        self.quality_report = verdict
        if not keep_rejects:
            keep_ids = verdict.filter(F.col("keep")).select("doc_id")
            self._documents = self._require_docs().join(keep_ids, "doc_id")
        return self

    def filter_language(self, keep: list[str]) -> Process:
        """Language gate (two-stage web-scale lang_id — Unicode-script
        histogram + stopword vote — over EXTRACTED main text, same
        stripped-content rule as filter_quality): keep only
        documents whose detected language is in ``keep``. The verdict
        (doc_id, lang, keep) is stashed as ``self.language_report``."""
        from extractthinker_spark.functions.textstats import lang_id

        merged = doc_text(self.extract_content(nest=True))
        verdict = merged.select(
            "doc_id",
            lang_id(F.col("content")).alias("lang"),
        ).withColumn("keep", F.col("lang").isin(*keep))
        self.language_report = verdict
        keep_ids = verdict.filter(F.col("keep")).select("doc_id")
        self._documents = self._require_docs().join(keep_ids, "doc_id")
        return self

    def filter_c4(
        self, blocklist: list[str] | None = None,
        keep_rejects: bool = False,
    ) -> Process:
        """C4 cleaning gate (Raffel et al. 2020) over each document's
        EXTRACTED main text — the companion to the Gopher gate
        (filter_quality): terminal-punctuation line rules, minimum
        surviving sentences, lorem-ipsum / curly-brace / blocklist
        page rejects. Verdict stashed as ``self.c4_report``."""
        from extractthinker_spark.functions.textstats import c4_filter

        merged = doc_text(self.extract_content(nest=True))
        verdict = c4_filter(
            merged.select("doc_id", F.col("content").alias("text")),
            blocklist=blocklist,
        )
        self.c4_report = verdict
        if not keep_rejects:
            keep_ids = verdict.filter(F.col("keep")).select("doc_id")
            self._documents = self._require_docs().join(keep_ids, "doc_id")
        return self

    def dedup_exact(self) -> Process:
        """Exact-duplicate gate: one document (smallest doc_id) per
        normalized-content fingerprint of the EXTRACTED main text —
        the first layer of the standard dedup stack (before near-dup
        and substring passes). The keep-list is stashed as
        ``self.dedup_report`` (doc_id, fp)."""
        from extractthinker_spark.operators.dedup import dedup_exact

        merged = doc_text(self.extract_content(nest=True))
        keep = dedup_exact(
            merged.select("doc_id", F.col("content").alias("text")),
            "doc_id", "text",
        )
        self.dedup_report = keep
        self._documents = self._require_docs().join(
            keep.select("doc_id"), "doc_id"
        )
        return self

    def cap_per_host(
        self, urls: DataFrame, max_per_host: int,
        url_col: str = "url",
    ) -> Process:
        """Per-domain document cap (RefinedWeb-style): given a
        (doc_id, url) mapping, keep at most ``max_per_host`` documents
        per host — deterministically the smallest doc_ids — so no
        template farm dominates the corpus. The per-host keep verdict
        is stashed as ``self.host_report`` (host, n_docs, n_kept)."""
        from extractthinker_spark.functions.urls import cap_per_host, url_host

        kept = cap_per_host(
            urls, max_per_host, key="doc_id", url_col=url_col
        ).select("doc_id", "host")
        self.host_report = (
            urls.withColumn("host", url_host(F.col(url_col)))
            .groupBy("host").agg(F.count(F.lit(1)).alias("n_docs"))
            .join(
                kept.groupBy("host").agg(F.count(F.lit(1)).alias("n_kept")),
                "host", "left",
            )
            .withColumn("n_kept", F.coalesce(F.col("n_kept"), F.lit(0)))
        )
        self._documents = self._require_docs().join(
            kept.select("doc_id"), "doc_id"
        )
        return self

    def decontaminate(
        self, bench: DataFrame, n: int = 13, bench_text_col: str = "text"
    ) -> Process:
        """Benchmark decontamination (GPT-3 §C / Llama rule): drop
        documents whose EXTRACTED text shares any word ``n``-gram with
        the evaluation set. The per-doc hit report (doc_id, hits,
        top_gram) is stashed as ``self.contamination_report`` for
        audit before the anti-join removes the flagged docs."""
        from extractthinker_spark.operators.decontam import (
            contamination_hits,
        )

        merged = doc_text(self.extract_content(nest=True))
        hits = contamination_hits(
            merged.select("doc_id", F.col("content").alias("text")),
            bench, n=n, bench_text_col=bench_text_col,
        )
        self.contamination_report = hits
        # No broadcast hint — the flagged set is unbounded (see
        # decontam.decontaminate); AQE picks the strategy at runtime.
        self._documents = self._require_docs().join(
            hits.select("doc_id"), "doc_id", "left_anti"
        )
        return self

    def score_lm(
        self, model=None, min_avg_logprob: float | None = None
    ) -> Process:
        """CCNet-style LM quality scoring over the EXTRACTED text:
        per-doc mean bigram log-prob lands in ``self.lm_scores``.
        With ``model=None`` the model is trained on this corpus itself
        (self-perplexity — useful for outlier pruning); pass a
        ``functions.lm.BigramLM`` trained on a trusted corpus for the
        true CCNet shape. ``min_avg_logprob`` additionally drops docs
        scoring below the threshold (docs with < 2 words have no
        transitions to score and are dropped too when filtering)."""
        from extractthinker_spark.functions.lm import (
            score_bigram_lm,
            train_bigram_lm,
        )

        merged = doc_text(self.extract_content(nest=True)).select(
            "doc_id", F.col("content").alias("text")
        )
        if model is None:
            model = train_bigram_lm(merged)
        self.lm_scores = score_bigram_lm(merged, model)
        if min_avg_logprob is not None:
            keep = self.lm_scores.filter(
                F.col("avg_logprob") >= min_avg_logprob
            ).select("doc_id")
            self._documents = self._require_docs().join(keep, "doc_id")
        return self

    def pack_sequences(
        self, budget: int, n_groups: int = 64, mode: str = "greedy"
    ) -> DataFrame:
        """Pack the EXTRACTED text into fixed-token-budget training
        sequences (operators/packing.py): ``mode='greedy'`` keeps
        documents atomic (first-fit in doc-hash order → per-sequence
        manifest with fill_frac), ``mode='chop'`` concatenates and
        chops at exact budget boundaries (GPT-style → per-(doc,
        sequence) slice rows). The funnel's last mile before the
        trainer."""
        from extractthinker_spark.operators.packing import (
            pack_chop,
            pack_sequences as _pack,
        )

        merged = doc_text(self.extract_content(nest=True)).select(
            "doc_id", F.col("content").alias("text")
        )
        if mode not in ("greedy", "chop"):
            raise ValueError(
                f"pack mode must be 'greedy' or 'chop', got {mode!r}"
            )
        packer = pack_chop if mode == "chop" else _pack
        return packer(merged, budget=budget, n_groups=n_groups)

    def scrub_pii(self, kinds: list[str] | None = None) -> Process:
        """Redact PII (functions/pii.py patterns) in-place across every
        text-bearing span of this process's documents — span structure,
        kinds, media refs and offsets are untouched. Run AFTER
        load/load_raw and before extraction/classification so no stage
        downstream ever sees raw identifiers."""
        from extractthinker_spark.functions.pii import scrub_pii as _scrub

        docs = self._require_docs()
        self._documents = docs.select(
            "doc_id",
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    F.when(
                        s["text"].isNotNull(), _scrub(s["text"], kinds)
                    ).alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
        return self

    # -- split --------------------------------------------------------------

    def split(self, strategy: SplitStrategy = SplitStrategy.LAZY) -> Process:
        """Page-group segmentation; requires pdf_text page spans. Pages
        classify against THIS process's registry (the reference splits
        with the user's classifications, process.py:228-236)."""
        rules = self.extractor._rules()
        pages = pages_from_documents(self._require_docs())
        if strategy == SplitStrategy.LAZY:
            self._grouped = split_lazy_pages(pages, rules)
        else:
            groups = split_eager(pages, rules)
            g = groups.select(
                "doc_id", "group_id", "classification",
                F.explode("pages").alias("page_no"),
            )
            self._grouped = g.join(pages, ["doc_id", "page_no"]).select(
                "doc_id", "group_id", "classification", "page_no", "content"
            )
        return self

    def groups(self) -> DataFrame:
        return self._require_groups()

    # -- classify / extract ---------------------------------------------------

    def classify(
        self,
        text_col: str = "content",
        strategy: ClassificationStrategy | None = None,
        threshold: int = 9,
    ) -> DataFrame:
        """Whole-document classification (no split): parse first, then
        classify the merged MAIN content — raw html boilerplate (nav
        bars full of '|', footers) must not feed the rule scorer, just
        as the reference classifies loader output, never raw bytes.

        With ``strategy`` + layers from add_classify_extractor, each
        layer's scorers run as parallel COLUMNS and the strategy gate
        (consensus / max-confidence / consensus∧threshold) picks the
        layer result; layers fall through in order, exhausted rows get
        Unknown/1 (process.py:95-125; the reference raises instead —
        at corpus scale a failed row must stay a row, not kill a job).
        """
        from extractthinker_spark.operators.classify import (
            consensus,
            consensus_with_threshold,
            higher_order,
            layered,
        )

        merged = doc_text(self.extract_content(nest=True))
        if strategy is None or not self._layers:
            return self.extractor.classify(merged, text_col=text_col).select(
                "doc_id", "classification", "confidence"
            )
        # Two-stage select: score once per (layer, extractor) into an
        # aliased column, then gate over the aliases — the strategy
        # expressions reference each result several times, and a flat
        # select would re-inline (re-run) the full regex scorer per
        # reference (no CSE across when-branches; measured ~8x on the
        # consensus oracle query).
        score_cols = []
        names: list[list[str]] = []
        for li, layer in enumerate(self._layers):
            row = []
            for ei, e in enumerate(layer):
                alias = f"_s{li}_{ei}"
                score_cols.append(e._score(F.col(text_col)).alias(alias))
                row.append(alias)
            names.append(row)
        scored = merged.select("doc_id", *score_cols)
        layer_exprs = []
        for row in names:
            results = [F.col(a) for a in row]
            if strategy == ClassificationStrategy.CONSENSUS:
                layer_exprs.append(consensus(*results))
            elif strategy == ClassificationStrategy.HIGHER_ORDER:
                layer_exprs.append(higher_order(*results))
            else:
                layer_exprs.append(
                    consensus_with_threshold(threshold, *results)
                )
        res = layered(*layer_exprs)
        return scored.select(
            "doc_id",
            res["name"].alias("classification"),
            res["confidence"].alias("confidence"),
        )

    def extract(
        self,
        completion: CompletionStrategy = CompletionStrategy.PAGINATE,
    ) -> DataFrame:
        """Per-group extraction after split(): long format
        (doc_id, group_id, contract, field, value)."""
        grouped = self._require_groups()
        keys = ["doc_id", "group_id"]
        contracts = self.extractor._contracts()
        list_contracts = self.extractor._list_contracts()
        if completion == CompletionStrategy.PAGINATE:
            return paginate_extract(
                grouped, keys=keys,
                contracts=contracts, list_contracts=list_contracts,
            )
        whole = grouped.groupBy(*keys, "classification").agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("page_no", "content"))),
                    lambda s: s["content"],
                ),
                "\n\n",
            ).alias("content")
        )
        return extract_fields(
            whole, keys=keys,
            contracts=contracts, list_contracts=list_contracts,
        )

    # -- internals ------------------------------------------------------------

    def _require_docs(self) -> DataFrame:
        if self._documents is None:
            raise ValueError("call load(documents) first")
        return self._documents

    def _require_groups(self) -> DataFrame:
        if self._grouped is None:
            raise ValueError("call split(strategy) first")
        return self._grouped
