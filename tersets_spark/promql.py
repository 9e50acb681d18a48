"""PromQL-lite: a text query surface over the committed tier catalog.

A restricted, openly-documented subset of PromQL range queries mapped
onto the engine's existing serving reads — the "switch your dashboards
over" face of the serving layer. One metric exists (``tokens``: the
per-source token-count series the tiers materialize); the grammar is

    expr      := agg | call | selector
    agg       := ('sum'|'min'|'max'|'avg') 'by' '(' label ')'
                 '(' selector ')'
    call      := name '(' args ')'
    selector  := 'tokens' matcher? window?
    matcher   := '{' 'source' ('='|'=~') STRING '}'
    window    := '[' INT unit ']'          unit: s | m | h | d
    args      := (NUMBER | selector) (',' (NUMBER | selector))*

Supported calls (→ the read they compile to):

* ``rate(tokens[w])`` / ``increase(tokens[w])`` — per-source
  reset-corrected counter rate per step cell (counter_rate over the
  step-rebucketed serving tier). Divergence from PromQL, stated: the
  lookback ``w`` must equal ``step`` (each cell's rate comes from its
  predecessor cell — the tier-native reading), and extrapolation is
  not performed (PromQL's rate extrapolates to the window edges).
* ``sum_over_time/avg_over_time/min_over_time/max_over_time/
  count_over_time(tokens[w])`` — trailing-window grid
  (rollup.moving_window) at the tier whose bucket equals ``step``.
* ``quantile_over_time(q, tokens[w])`` — per-cell percentile off the
  committed psk sketch tiers (jobs.percentile_grid_from_catalog);
  ``w`` must equal ``step``. Approximate at sketch resolution
  (<= ~3.1% relative), which PromQL's exact-sample quantile is not —
  stated divergence, it is the price of never rescanning raw data.
* ``absent_over_time(tokens[w])`` — stale-feed cells
  (rollup.absent_series); ``w`` must equal ``step``.
* ``topk(k, tokens)`` — top-k series per step window
  (rollup.top_series).
* ``predict_linear(tokens[w], t)`` — least-squares trend over the
  trailing ``w`` at ``end``, extrapolated ``t`` seconds
  (jobs.predict_from_catalog) — an instant query.

Aggregations: ``sum by (source) (tokens)`` (and min/max/avg) grid the
selector per (source, step cell); ``sum by (grp) (tokens)`` routes
through the label mapping (rollup.group_aggregate) and needs
``mapping=``. A bare ``tokens`` selector is ``sum by (source)``.

Matchers: ``{source="src_01"}`` and ``{source=~"src_01|src_02"}`` —
the regex form accepts ONLY a literal alternation (``a|b|c``); any
other regex metacharacter is rejected loudly rather than half-honored.

Scale: every compiled read is one of the engine's existing pruned
catalog reads — pushed bucket_ts ranges on time-clustered committed
scans, sketch tiers for quantiles, bounded grids. The parser adds zero
data-path cost.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["parse", "query_instant", "query_range"]

_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<number>\d+(?:\.\d+)?)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<string>"[^"]*")
      | (?P<op>=~|[()\[\]{},=])
    )""",
    re.X,
)


def _tokenize(expr: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if m is None or m.end() == pos:
            rest = expr[pos:].strip()
            if not rest:
                break
            raise ValueError(f"promql: cannot tokenize at {rest[:20]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


class _Selector:
    def __init__(self, sources=None, window=None):
        self.sources = sources  # None | list[str]
        self.window = window    # None | seconds


class _Call:
    def __init__(self, func, args):
        self.func = func
        self.args = args        # list of _Selector | float


class _Agg:
    def __init__(self, op, label, sel):
        self.op = op
        self.label = label
        self.sel = sel


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def take(self, kind=None, value=None):
        k, v = self.peek()
        if k is None:
            raise ValueError("promql: unexpected end of expression")
        if (kind and k != kind) or (value and v != value):
            raise ValueError(f"promql: expected {value or kind}, got {v!r}")
        self.i += 1
        return v

    def parse(self):
        node = self.expr()
        if self.i != len(self.toks):
            raise ValueError(
                f"promql: trailing input at {self.peek()[1]!r}"
            )
        return node

    def expr(self):
        k, v = self.peek()
        if k == "ident" and v in ("sum", "min", "max", "avg") and \
                self.peek(1) == ("ident", "by"):
            self.take(); self.take()
            self.take("op", "(")
            label = self.take("ident")
            self.take("op", ")")
            self.take("op", "(")
            sel = self.selector()
            self.take("op", ")")
            return _Agg(v, label, sel)
        if k == "ident" and v != "tokens":
            func = self.take("ident")
            self.take("op", "(")
            args = [self.arg()]
            while self.peek() == ("op", ","):
                self.take()
                args.append(self.arg())
            self.take("op", ")")
            return _Call(func, args)
        return self.selector()

    def arg(self):
        k, v = self.peek()
        if k == "number":
            self.take()
            return float(v)
        return self.selector()

    def selector(self):
        self.take("ident", "tokens")
        sources = None
        if self.peek() == ("op", "{"):
            self.take()
            label = self.take("ident")
            if label != "source":
                raise ValueError(
                    f"promql: unknown label {label!r} (only source)"
                )
            op = self.take("op")
            if op not in ("=", "=~"):
                raise ValueError(f"promql: unsupported matcher op {op!r}")
            raw = self.take("string")[1:-1]
            if op == "=":
                sources = [raw]
            else:
                if re.search(r"[.*+?()\[\]{}^$\\]", raw):
                    raise ValueError(
                        "promql: =~ accepts only a literal alternation "
                        f"(a|b|c), got {raw!r}"
                    )
                sources = [s for s in raw.split("|") if s]
            self.take("op", "}")
        window = None
        if self.peek() == ("op", "["):
            self.take()
            raw_n = self.take("number")
            if "." in raw_n:
                raise ValueError(
                    f"promql: durations are integers (got {raw_n!r}) — "
                    "write 90m, not 1.5h"
                )
            n = int(raw_n)
            unit = self.take("ident")
            if unit not in _UNIT_SECONDS:
                raise ValueError(f"promql: unknown duration unit {unit!r}")
            window = n * _UNIT_SECONDS[unit]
            self.take("op", "]")
        return _Selector(sources, window)


def parse(expr: str):
    """Parse a PromQL-lite expression into its (tiny) AST."""
    return _Parser(_tokenize(expr)).parse()


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def _require_window(sel, step: int, func: str) -> None:
    if sel.window is None:
        raise ValueError(f"promql: {func} needs a [window] on its selector")
    if sel.window != step:
        raise ValueError(
            f"promql: {func} lookback {sel.window}s must equal step {step}s "
            "(each cell derives from its predecessor cell — the tier-native "
            "reading; pick the step to match the window)"
        )


def _grid(
    spark: SparkSession,
    out_dir: str,
    sel,
    start: int,
    end: int,
    step: int,
    as_of,
) -> DataFrame:
    """Per-(source, step cell) exact totals from the coarsest dividing
    committed tier — the base 'instant vector at every step' read."""
    from .jobs import _read_tier_range
    from .rollup import serving_tier_for_step

    name, _secs = serving_tier_for_step(step)
    df = _read_tier_range(
        spark, out_dir, name, int(start), int(end), as_of, "promql"
    )
    if sel.sources is not None:
        df = df.where(F.col("source").isin(sel.sources))
    cell = (F.floor(F.col("bucket_ts") / step) * step).cast("long")
    return df.groupBy("source", cell.alias("bucket_ts")).agg(
        F.sum("sum").cast("long").alias("value"),
        F.sum("cnt").cast("long").alias("cnt"),
        F.min("vmin").cast("long").alias("vmin"),
        F.max("vmax").cast("long").alias("vmax"),
    )


def query_range(
    spark: SparkSession,
    out_dir: str,
    expr: str,
    start: int,
    end: int,
    step: int,
    mapping: DataFrame | None = None,
    as_of: int | None = None,
) -> DataFrame:
    """Evaluate a PromQL-lite range query over a committed catalog.

    ``[start, end)`` must be step-aligned. Returns the compiled read's
    DataFrame (schemas documented per function in the module
    docstring)."""
    s, e, step = int(start), int(end), int(step)
    if e <= s or (e - s) % step or s % step:
        raise ValueError("promql: [start, end) must be step-aligned")
    node = parse(expr)

    if isinstance(node, _Selector):
        node = _Agg("sum", "source", node)

    if isinstance(node, _Agg):
        if node.sel.window is not None:
            raise ValueError(
                "promql: aggregation takes an instant selector (no [window])"
            )
        if node.label == "source":
            g = _grid(spark, out_dir, node.sel, s, e, step, as_of)
            # avg of the cell's points = sum/cnt — both exact integers
            # the grid already carries, one bit-stable division
            agg = {"sum": F.col("value"), "min": F.col("vmin"),
                   "max": F.col("vmax"),
                   "avg": F.col("value").cast("double") / F.col("cnt")}[
                       node.op]
            return g.select("source", "bucket_ts", agg.alias("value"))
        if node.label == "grp":
            if mapping is None:
                raise ValueError("promql: sum by (grp) needs mapping=")
            if node.op != "sum":
                raise ValueError("promql: only sum is supported by (grp)")
            from .jobs import group_from_catalog

            out = group_from_catalog(
                spark, out_dir, mapping, tier="1h", start=s, end=e,
                as_of=as_of,
            )
            if step % 3600 or step != 3600:
                raise ValueError(
                    "promql: sum by (grp) serves at step=3600 (the group "
                    "tier's bucket)"
                )
            if node.sel.sources is not None:
                raise ValueError(
                    "promql: matchers and by (grp) cannot combine — filter "
                    "the mapping instead"
                )
            return out.select("grp", "bucket_ts", F.col("sum").alias("value"))
        raise ValueError(f"promql: unknown by-label {node.label!r}")

    assert isinstance(node, _Call)
    func, args = node.func, node.args

    if func in ("rate", "increase"):
        (sel,) = args
        _require_window(sel, step, func)
        g = _grid(spark, out_dir, sel, s, e, step, as_of)
        w = Window.partitionBy("source").orderBy("bucket_ts")
        prev_v = F.lag("value").over(w)
        prev_t = F.lag("bucket_ts").over(w)
        inc = F.when(F.col("value") >= prev_v, F.col("value") - prev_v) \
               .otherwise(F.col("value"))
        out = (
            g.select(
                "source", "bucket_ts", "value",
                inc.cast("long").alias("increase"),
                (F.col("bucket_ts") - prev_t).cast("long").alias("elapsed"),
            )
            .where(F.col("elapsed").isNotNull())
        )
        if func == "rate":
            out = out.withColumn(
                "value", F.col("increase") / F.col("elapsed")
            )
        else:
            out = out.withColumn("value", F.col("increase").cast("double"))
        return out.select("source", "bucket_ts", "value")

    if func in ("sum_over_time", "avg_over_time", "min_over_time",
                "max_over_time", "count_over_time"):
        (sel,) = args
        if sel.window is None or sel.window % step or sel.window < step:
            raise ValueError(
                f"promql: {func} window must be a multiple of step"
            )
        from .jobs import _read_tier_range
        from .rollup import moving_window, serving_tier_for_step

        name, secs = serving_tier_for_step(step)
        if secs != step:
            raise ValueError(
                f"promql: {func} serves at a tier-native step "
                f"(60/3600/86400s), got {step}s"
            )
        df = _read_tier_range(
            spark, out_dir, name, s - sel.window, e, as_of, "promql"
        )
        if sel.sources is not None:
            df = df.where(F.col("source").isin(sel.sources))
        mv = moving_window(df, sel.window, step).where(
            F.col("bucket_ts") >= s
        )
        col = {"sum_over_time": "w_sum", "avg_over_time": "w_avg",
               "min_over_time": "w_min", "max_over_time": "w_max",
               "count_over_time": "w_cnt"}[func]
        return mv.select(
            "source", "bucket_ts", F.col(col).cast("double").alias("value")
        )

    if func == "quantile_over_time":
        q, sel = args
        if not isinstance(q, float) or not (0 <= q <= 1):
            raise ValueError("promql: quantile_over_time needs 0 <= q <= 1")
        if abs(q * 100 - round(q * 100)) > 1e-9:
            raise ValueError(
                f"promql: q={q} is not a whole percent — the sketch grid "
                "serves integer percentiles (p0-p100); q=0.995 would have "
                "silently become p100"
            )
        _require_window(sel, step, func)
        if sel.sources is not None:
            raise ValueError(
                "promql: quantile_over_time matchers are not supported "
                "(the sketch grid serves all sources; filter the result)"
            )
        from .jobs import percentile_grid_from_catalog

        pct = int(round(q * 100))
        out = percentile_grid_from_catalog(
            spark, out_dir, s, e, step, pcts=(pct,), as_of=as_of
        )
        return out.select(
            "source", "bucket_ts",
            F.col("estimate").cast("double").alias("value"),
        )

    if func == "absent_over_time":
        (sel,) = args
        _require_window(sel, step, func)
        from .jobs import absent_from_catalog
        from .rollup import serving_tier_for_step

        # the serving tier's bucket must divide the step — a 30s step
        # over 60s buckets would mark live feeds absent in every
        # bucket-less cell (serving_tier_for_step rejects such steps)
        name, _secs = serving_tier_for_step(step)
        return absent_from_catalog(
            spark, out_dir, s, e, tier=name,
            step_seconds=step, expected=sel.sources, as_of=as_of,
        )

    if func == "topk":
        k, sel = args
        if not isinstance(k, float) or k < 1:
            raise ValueError("promql: topk needs k >= 1")
        if sel.window is not None:
            raise ValueError("promql: topk takes an instant selector")
        if sel.sources is not None:
            raise ValueError("promql: topk matchers are not supported")
        from .jobs import top_from_catalog
        from .rollup import serving_tier_for_step

        name, _secs = serving_tier_for_step(step)
        return top_from_catalog(
            spark, out_dir, tier=name, k=int(k), window_seconds=step,
            start=s, end=e, as_of=as_of,
        )

    if func == "predict_linear":
        sel, horizon = args
        if sel.window is None:
            raise ValueError("promql: predict_linear needs a [window]")
        if not isinstance(horizon, float):
            raise ValueError("promql: predict_linear needs a horizon number")
        from .jobs import predict_from_catalog

        return predict_from_catalog(
            spark, out_dir, e - sel.window, e, int(horizon), as_of=as_of
        )

    raise ValueError(f"promql: unsupported function {func!r}")


def query_instant(
    spark: SparkSession,
    out_dir: str,
    expr: str,
    at: int,
    lookback: int = 300,
    as_of: int | None = None,
) -> DataFrame:
    """Evaluate a PromQL-lite INSTANT query at evaluation time ``at``.

    Two shapes:

    * a bare selector (``tokens`` / ``tokens{source="x"}``) — each
      series' most recent sample in the staleness window
      ``(at - lookback, at]`` plus idelta/irate from the final bucket
      pair (jobs.instant_from_catalog; PromQL's 5-minute staleness
      default scaled by ``lookback``);
    * ``irate(tokens[w])`` / ``idelta(tokens[w])`` — the same read with
      ``lookback = w``, projected to (keys, ts, value).

    The range form lives in :func:`query_range`; mixing a [window] onto
    a bare instant selector is rejected (PromQL would too).
    """
    from .jobs import instant_from_catalog

    node = parse(expr)
    if isinstance(node, _Call):
        if node.func not in ("irate", "idelta"):
            raise ValueError(
                f"promql: instant queries support irate/idelta or a bare "
                f"selector, got {node.func!r}"
            )
        (sel,) = node.args
        if sel.window is None:
            raise ValueError(f"promql: {node.func} needs a [window]")
        out = instant_from_catalog(
            spark, out_dir, int(at), int(sel.window), as_of=as_of
        )
        if sel.sources is not None:
            out = out.where(F.col("source").isin(sel.sources))
        col = "irate" if node.func == "irate" else "idelta"
        return out.select(
            "doc_id", "source", F.col("sample_ts"),
            F.col(col).cast("double").alias("value"),
        )
    if not isinstance(node, _Selector):
        raise ValueError("promql: instant queries take a selector or irate/idelta")
    if node.window is not None:
        raise ValueError(
            "promql: an instant selector takes no [window] — pass lookback="
        )
    out = instant_from_catalog(spark, out_dir, int(at), int(lookback), as_of=as_of)
    if node.sources is not None:
        out = out.where(F.col("source").isin(node.sources))
    return out
