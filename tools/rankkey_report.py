"""Ranked-cut sort-key audit across the whole catalog → RANKKEYS.md.

Round-7 established the ranked-cut discipline by hand: every row-selecting
cut (ORDER BY + LIMIT, rank-window filter, float-threshold filter) must
use a key that is bit-identical across engines — raw for IEEE-exact keys
(integers, strings, decimal sums, per-row float folds, single divisions),
`round(x, 6|9)` on BOTH engines for order-dependent keys (cross-row
double sums/avgs, libm calls like ln/exp/pow whose last ulp may differ
between the JVM and DuckDB's libm).  Round-8 (verdict item 1) mechanizes
the audit so the next float-scored top-k added to the catalog cannot
silently reintroduce the latent cross-engine argmax-flip class.

For every catalog query this tool:
- builds the OPTIMIZED LOGICAL plan (cuts print as GlobalLimit/LocalLimit
  over Sort, rank-family Window nodes, and Filter/Join float-literal
  comparisons; round() keys print inline or resolve through `AS` aliases);
- walks the plan via py4j to recover every attribute's real data type and
  whether it comes from a leaf (parquet Relation = stored identically for
  the oracle; LogicalRDD = a session checkpoint whose upstream the oracle
  RE-COMPUTES, so an opaque float from one is treated as risky);
- classifies every cut key / threshold operand as `rounded`, `exact`, or
  `risky`, resolving attribute references through their defining
  expressions first;
- scans the paired DuckDB oracle SQL for the same three cut shapes and
  classifies those keys with the same rules (alias definitions resolved,
  base-table column types from the parquet schemas).

Any risky site not covered by ALLOW_RAW (each entry carries the reason
the raw key IS cross-engine exact, mirroring plan_report.ALLOW_BOUNDED)
fails the run loudly; so does a stale ALLOW_RAW entry whose query no
longer has any risky site.  tests/test_rankkeys.py pins the allowlist and
proves a deliberately-broken fixture (raw float-sum top-k) is caught.

Run: python tools/rankkey_report.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

RANK_FUNCS = ("row_number", "rank", "dense_rank", "ntile", "percent_rank",
              "cume_dist")

# libm-backed scalar functions whose last ulp may differ between engines.
# sqrt is NOT here: IEEE 754 requires correctly-rounded sqrt, and the
# silhouette/knn oracles rely on that.
LIBM_RE = re.compile(
    r"\b(?:ln|log|log10|log2|log1p|exp|expm1|pow|power|cbrt|"
    r"atan2?|asin|acos|sinh?|cosh?|tanh?|gamma|lgamma|erfc?)\s*\(",
    re.I,
)
# cross-row float accumulators (order-dependent) + inherently-float stats
AGG_RE = re.compile(
    r"\b(sum|avg|mean|stddev(?:_samp|_pop)?|std|var(?:_samp|_pop|iance)|"
    r"corr|covar(?:_samp|_pop)|skewness|kurtosis|percentile(?:_approx)?)"
    r"\s*\(",
    re.I,
)
ALWAYS_FLOAT_AGGS = {"stddev", "stddev_samp", "stddev_pop", "std",
                     "var", "var_samp", "var_pop", "variance", "corr",
                     "covar_samp", "covar_pop", "skewness", "kurtosis",
                     "percentile", "percentile_approx"}
FLOAT_LIT_RE = re.compile(r"(?<![\w.])\d+\.\d+(?:[eE][+-]?\d+)?\b")
ATTR_RE = re.compile(r"[A-Za-z_][\w$]*#\d+L?\b")
CMP_RE = re.compile(r"(>=|<=|=>|=<|<|>)")

# Queries allowed to carry a RAW (un-rounded) float-typed cut key, each
# with the reason that key is nonetheless cross-engine bit-exact or the
# flip risk is structurally absent.  Pinned by tests/test_rankkeys.py —
# an unexplained risky site fails this tool loudly; so does a stale entry.
ALLOW_RAW: dict[str, str] = {
    "tpch_q18": "sum(l_quantity) over INTEGER-VALUED doubles (TPC-H "
                "quantities are whole 1..50): every partial sum is an exact "
                "integer below 2^53, so order cannot change it",
    "tpch_q20": "same integer-valued sum(l_quantity); the 0.5* threshold "
                "is one exact halving of an exact integer",
    "events_changepoint": "closed-form SSE costs from prefix sums of "
                "integer-valued hourly counts — exact below 2^53 (pinned "
                "in the query docstring), per-row ratio algebra after",
    "events_ks": "CDF gaps are per-row ratios of BIGINT prefix counts — "
                "exact integer numerators, one division each",
    "events_mad_outliers": "median/MAD cuts key on exact percentiles: "
                "order-statistic selection + one (1-g)*a+g*b interpolation, "
                "identical in Spark percentile and DuckDB quantile_cont; "
                "no accumulation",
    "events_anomalies": "the only row cut on the windowed stddev is "
                "sd > 0: stddev of an all-equal integer frame is exactly "
                "0.0 under both engines' update formulas, and any nonzero "
                "integer spread is bounded >= 1/nw^2 away from 0",
    "lr_quality": "documented bit-close GD replay gate (weights 4dp): the "
                "0.5 sigmoid cut is monotone-equivalent to z > 0, z a "
                "per-row fold of the replayed weights; empirically stable "
                "r4-r8, measure bounded by the replay agreement",
}


def _balanced_backward(text: str, pos: int) -> str:
    """The full expression ending just before ``pos`` — scan left counting
    parens, stopping at an unmatched '(' or a top-level ',' or '[' (the
    same extraction used for `expr AS alias#id` definition harvesting)."""
    depth = 0
    i = pos - 1
    out = []
    while i >= 0:
        ch = text[i]
        if ch == ")":
            depth += 1
        elif ch == "(":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0 and ch in ",[":
            break
        out.append(ch)
        i -= 1
    return "".join(reversed(out)).strip()


def _balanced_forward(text: str, pos: int) -> str:
    """The full expression starting at ``pos`` — scan right, stopping at
    an unmatched ')' or a top-level ',' / ' AND ' / ' OR '."""
    depth = 0
    i = pos
    n = len(text)
    out = []
    while i < n:
        ch = text[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0:
            if ch == ",":
                break
            if text[i:i + 5] in (" AND ", " AND\n") or text[i:i + 4] in (" OR ", " OR\n"):
                break
        out.append(ch)
        i += 1
    return "".join(out).strip()


def _split_top_level(text: str) -> list[str]:
    """Split on top-level commas (outside any parens/brackets)."""
    parts, depth, buf = [], 0, []
    for ch in text:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _indent(line: str) -> int:
    return len(re.match(r"^[\s:+\-*!]*", line).group(0))


def _strip_outer_parens(e: str) -> str:
    e = e.strip()
    while e.startswith("(") and e.endswith(")"):
        depth = 0
        for i, ch in enumerate(e):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i < len(e) - 1:
                    return e  # outer parens do not wrap the whole thing
        e = e[1:-1].strip()
    return e


def _mask_rounded(text: str) -> str:
    """Replace every balanced `round(...)` group with a placeholder so
    risk scans do not fire on already-disciplined subexpressions (e.g. a
    rank whose windowspecdefinition orders by round(sum(ln(..)), 6) is
    safe — the libm/cross-row noise is quantized away inside the round)."""
    out = text
    while True:
        m = re.search(r"\bround\s*\(", out, re.I)
        if not m:
            return out
        depth, i = 1, m.end()
        while i < len(out) and depth:
            if out[i] == "(":
                depth += 1
            elif out[i] == ")":
                depth -= 1
            i += 1
        out = out[:m.start()] + "RNDKEY" + out[i:]


# --------------------------------------------------------------------------
# Spark side
# --------------------------------------------------------------------------


def walk_types(jplan) -> tuple[dict[int, str], dict[int, str]]:
    """(exprId -> simple dataType, exprId -> leaf node class) for every
    node output in the logical plan (py4j recursive walk, ~ms)."""
    types: dict[int, str] = {}
    leaves: dict[int, str] = {}
    stack = [jplan]
    while stack:
        node = stack.pop()
        out = node.output()
        is_leaf = node.children().size() == 0
        cls = node.getClass().getSimpleName() if is_leaf else ""
        for i in range(out.size()):
            a = out.apply(i)
            types[a.exprId().id()] = a.dataType().simpleString()
            if is_leaf:
                leaves[a.exprId().id()] = cls
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return types, leaves


def harvest_defs(plan: str) -> dict[str, str]:
    """attr-token -> defining expression, from every `expr AS name#id`."""
    defs: dict[str, str] = {}
    for line in plan.splitlines():
        for m in re.finditer(r" AS ([A-Za-z_][\w$]*#\d+L?)\b", line):
            expr = _balanced_backward(line, m.start())
            if expr:
                defs.setdefault(m.group(1), expr)
    return defs


def resolve(expr: str, defs: dict[str, str], max_len: int = 60_000) -> str:
    """Inline attribute definitions until fixpoint (depth-capped)."""
    for _ in range(12):
        new = ATTR_RE.sub(
            lambda m: f"({defs[m.group(0)]})" if m.group(0) in defs else m.group(0),
            expr,
        )
        if new == expr or len(new) > max_len:
            return new
        expr = new
    return expr


def _attr_id(token: str) -> int:
    return int(token.rstrip("L").rsplit("#", 1)[1])


def _has_float_content(arg: str, types: dict[int, str],
                       leaves: dict[int, str]) -> bool:
    """True when an aggregate argument accumulates floats: any float
    literal, division, double cast, libm call, nested agg, or reference
    to a float/double-typed attribute.  Decimal-cast arithmetic without
    division/double-cast is exact and overrides the literal signal
    (tpch revenue sums)."""
    low = arg.lower()
    if " as decimal" in low and "/" not in arg and " as double" not in low:
        return False
    if "/" in arg or " as double" in low or " as float" in low:
        return True
    if LIBM_RE.search(arg) or AGG_RE.search(arg):
        return True
    if FLOAT_LIT_RE.search(arg):
        return True
    for m in ATTR_RE.finditer(arg):
        t = types.get(_attr_id(m.group(0)), "")
        if t in ("double", "float") or t.startswith("array<double>") or \
                t.startswith("array<float>"):
            return True
    return False


def classify(expr: str, defs: dict[str, str], types: dict[int, str],
             leaves: dict[int, str]) -> tuple[str, str]:
    """('rounded'|'exact'|'risky', detail) for a cut key / threshold
    operand.  Per-row float arithmetic is exact (IEEE ops are
    deterministic and both engines evaluate the written tree); the risky
    classes are cross-row float accumulation, libm calls, and opaque
    floats read from a session checkpoint the oracle re-computes."""
    r = resolve(expr.strip(), defs)
    stripped = _strip_outer_parens(r)
    # peel benign outer casts: cast(round(..) as double) etc.
    m = re.match(r"cast\((.*) as [\w (),]+\)$", stripped, re.I)
    if m:
        inner = m.group(1).strip()
        # only peel when the parens balance (avoid cast(a as x) || cast(b..))
        if inner.count("(") == inner.count(")"):
            stripped = _strip_outer_parens(inner)
    if re.match(r"round\(", stripped, re.I):
        return "rounded", ""
    masked = _mask_rounded(r)
    if LIBM_RE.search(masked):
        return "risky", f"libm call in key: {masked[:90]}"
    for m in AGG_RE.finditer(masked):
        fname = m.group(1).lower()
        arg = _balanced_forward(masked, m.end())
        if fname in ALWAYS_FLOAT_AGGS:
            return "risky", f"float statistic {fname}(...) in key"
        if _has_float_content(arg, types, leaves):
            return "risky", f"cross-row float {fname}({arg[:70]}...)"
    # raw float attrs that resolve to a checkpoint leaf: the oracle
    # recomputes their upstream, which this audit cannot see — risky
    for m in ATTR_RE.finditer(masked):
        tok = m.group(0)
        aid = _attr_id(tok)
        t = types.get(aid, "")
        if t in ("double", "float") and leaves.get(aid, "") == "LogicalRDD":
            return "risky", f"opaque checkpoint float {tok}"
    return "exact", ""


def _order_keys(spec: str) -> list[str]:
    """Strip `ASC|DESC NULLS FIRST|LAST` markers from a sort-spec list."""
    keys = []
    for item in _split_top_level(spec):
        k = re.sub(r"\s+(ASC|DESC)(\s+NULLS\s+(FIRST|LAST))?\s*$", "", item)
        keys.append(k.strip())
    return keys


def _spec_args(line: str, start: int) -> list[str]:
    """Top-level args of the windowspecdefinition starting at ``start``."""
    depth, buf, args = 1, [], []
    for ch in line[start:]:
        if ch == "," and depth == 1:
            args.append("".join(buf).strip())
            buf = []
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args.append("".join(buf).strip())
                break
        buf.append(ch)
    return args


def find_spark_cuts(plan: str) -> list[tuple[str, str]]:
    """(site, key/operand expression) for every row-selecting cut:
    Sort-under-Limit keys, rank-window order keys, float-literal
    comparisons in Filter/Join conditions."""
    lines = plan.splitlines()
    cuts: list[tuple[str, str]] = []

    def parent_chain(i: int):
        base = _indent(lines[i])
        for j in range(i - 1, -1, -1):
            if not lines[j].strip():
                continue
            ind = _indent(lines[j])
            if ind < base:
                yield lines[j]
                base = ind

    for i, line in enumerate(lines):
        m = re.search(r"\bSort \[(.*?)\], (?:true|false)", line)
        if m:
            for anc in parent_chain(i):
                node = re.sub(r"^[\s:+\-*!]*", "", anc)
                if re.match(r"(Global|Local)?Limit\b", node):
                    for k in _order_keys(m.group(1)):
                        cuts.append(("sort+limit", k))
                    break
                if not re.match(r"(Project|SubqueryAlias|Window|Filter)\b",
                                node):
                    break
        for wm in re.finditer(
            r"(\w+)\((?:[^()]|\([^()]*\))*\)\s+windowspecdefinition\(", line
        ):
            if wm.group(1).lower() not in RANK_FUNCS:
                continue
            for arg in _spec_args(line, wm.end()):
                if re.search(r"\s(?:ASC|DESC)\b", arg):
                    for k in _order_keys(arg):
                        cuts.append(("rank-window", k))
        if re.search(r"^[\s:+\-*!]*(Filter |Join )", line):
            for cm in CMP_RE.finditer(line):
                rhs = line[cm.end():].lstrip()
                lm = FLOAT_LIT_RE.match(rhs)
                if lm:
                    operand = _balanced_backward(line, cm.start())
                    if operand and not FLOAT_LIT_RE.fullmatch(operand):
                        cuts.append(("float-threshold", operand))
                    continue
                # literal on the left: 0.6 <= expr
                lhs = _balanced_backward(line, cm.start())
                if FLOAT_LIT_RE.fullmatch(lhs or ""):
                    operand = _balanced_forward(line, cm.end()).strip()
                    if operand:
                        cuts.append(("float-threshold", operand))
    return cuts


# --------------------------------------------------------------------------
# Oracle SQL side
# --------------------------------------------------------------------------


def _sql_flat(sql: str) -> str:
    return re.sub(r"\s+", " ", sql)


def _sql_defs(flat: str) -> dict[str, list[tuple[int, str]]]:
    """ident -> [(position, defining expression)] from every
    `expr AS ident` in the FLATTENED SQL text.  Classification binds a
    bare identifier to the NEAREST PRECEDING definition — the in-scope
    one for a CTE-local ORDER BY, and the final SELECT's output alias
    for the query-level ORDER BY (DuckDB's bare-name binding, which the
    ranked-cut discipline exploits: `score` binds `round(..,6) AS score`
    while raw IEEE-exact keys must be QUALIFIED past it, e.g.
    `rules.lift`)."""
    defs: dict[str, list[tuple[int, str]]] = {}
    for m in re.finditer(r"\sAS\s+(\w+)\b", flat, re.I):
        expr = _balanced_backward(flat, m.start())
        if expr and expr.upper() not in ("", "SELECT"):
            defs.setdefault(m.group(1).lower(), []).append((m.start(), expr))
    return defs


def _sql_classify(expr: str, defs: dict[str, list[tuple[int, str]]],
                  base_types: dict[str, str], depth: int = 0,
                  pos: int = -1) -> tuple[str, str]:
    e = _strip_outer_parens(expr.strip().rstrip(";"))
    if depth > 6:
        return "exact", ""
    m = re.match(r"CAST\s*\((.*)\s+AS\s+[\w() ,\[\]]+\)$", e, re.I)
    if m and m.group(1).count("(") == m.group(1).count(")"):
        e = _strip_outer_parens(m.group(1).strip())
    if re.match(r"round\s*\(", e, re.I):
        return "rounded", ""
    masked = _mask_rounded(e)
    if LIBM_RE.search(masked):
        return "risky", f"libm call in oracle key: {masked[:90]}"
    for am in AGG_RE.finditer(masked):
        fname = am.group(1).lower()
        arg = _balanced_forward(masked, am.end())
        if fname in ALWAYS_FLOAT_AGGS:
            return "risky", f"float statistic {fname} in oracle key"
        low = arg.lower()
        floaty = (
            "/" in arg
            or FLOAT_LIT_RE.search(arg)
            or "as double" in low
            or "::double" in low
            or LIBM_RE.search(arg)
            or AGG_RE.search(arg)
            or any(
                base_types.get(t.lower(), "") in ("double", "float")
                or base_types.get(t.lower(), "").startswith("list")
                for t in re.findall(r"\b(\w+)\b", arg)
            )
        )
        if ("as decimal" in low or "::decimal" in low) and "/" not in arg \
                and "as double" not in low:
            floaty = False
        if floaty:
            return "risky", f"cross-row float {fname}({arg[:70]}...)"
    # bare identifier (possibly qualified): resolve via alias defs / schema
    im = re.fullmatch(r"(?:(\w+)\.)?(\w+)", e)
    if im:
        name = im.group(2).lower()
        cands = defs.get(name, [])
        if cands:
            # nearest PRECEDING definition = the in-scope binding (CTE
            # locality; the final SELECT's alias precedes the final
            # ORDER BY too).  Fall back to the first definition when the
            # site position is unknown or every definition follows it.
            before = [c for c in cands if c[0] < pos] if pos >= 0 else []
            chosen = max(before, key=lambda c: c[0]) if before else cands[0]
            c = _sql_classify(chosen[1], defs, base_types, depth + 1,
                              pos=chosen[0])
            if c[0] == "risky":
                return "risky", f"alias {name}: {c[1]}"
            return c
        # a stored base column (any type) is identical on both engines
        return "exact", ""
    return "exact", ""


def find_sql_cuts(flat: str) -> list[tuple[str, str, int]]:
    """(site, key expression, position) from the FLATTENED oracle text:
    rank-window ORDER BY keys, `ORDER BY ... LIMIT` keys, float-literal
    comparisons.  Positions index into the flattened text so alias
    resolution can bind nearest-preceding definitions."""
    cuts: list[tuple[str, str, int]] = []
    # rank windows
    for m in re.finditer(
        r"\b(" + "|".join(RANK_FUNCS) + r")\s*\([^)]*\)\s+OVER\s*\(", flat, re.I
    ):
        depth, i = 1, m.end()
        while i < len(flat) and depth:
            if flat[i] == "(":
                depth += 1
            elif flat[i] == ")":
                depth -= 1
            i += 1
        over = flat[m.end():i - 1]
        om = re.search(r"\bORDER\s+BY\s+(.*)$", over, re.I)
        if om:
            for k in _order_keys_sql(om.group(1)):
                cuts.append(("rank-window", k, m.start()))
    # ORDER BY ... LIMIT
    for m in re.finditer(r"\bORDER\s+BY\s+", flat, re.I):
        # skip window ORDER BY (inside an OVER group — detected by an
        # unmatched ')' before the next LIMIT)
        seg, depth, i = [], 0, m.end()
        while i < len(flat):
            ch = flat[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            if depth == 0 and re.match(r"\bLIMIT\b", flat[i:], re.I):
                for k in _order_keys_sql("".join(seg)):
                    cuts.append(("sort+limit", k, m.start()))
                break
            if depth == 0 and re.match(
                r"\b(UNION|EXCEPT|INTERSECT|WINDOW)\b", flat[i:], re.I
            ):
                break
            seg.append(ch)
            i += 1
    # float-literal comparisons (WHERE / ON / HAVING / qualify)
    for cm in re.finditer(r"(>=|<=|<|>)\s*(\d+\.\d+)", flat):
        operand = _balanced_backward(flat, cm.start())
        if operand and not FLOAT_LIT_RE.fullmatch(operand):
            cuts.append(("float-threshold", operand, cm.start()))
    for cm in re.finditer(r"(\d+\.\d+)\s*(>=|<=|<|>)", flat):
        operand = _balanced_forward(flat, cm.end())
        if operand and not FLOAT_LIT_RE.fullmatch(operand):
            cuts.append(("float-threshold", operand, cm.start()))
    return cuts


def _order_keys_sql(spec: str) -> list[str]:
    keys = []
    for item in _split_top_level(spec):
        k = re.sub(
            r"\s+(ASC|DESC)\b(\s+NULLS\s+(FIRST|LAST))?\s*$", "", item,
            flags=re.I,
        ).strip()
        if k and not k.isdigit():  # ordinals resolve to select items; the
            keys.append(k)         # only cut ordinals in the catalog are ints
    return keys


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def audit_query(df, oracle: str | None):
    qe = df._jdf.queryExecution()
    jplan = qe.optimizedPlan()
    plan = jplan.toString()
    types, leaves = walk_types(jplan)
    defs = harvest_defs(plan)
    rows = []
    for site, key in find_spark_cuts(plan):
        cls, why = classify(key, defs, types, leaves)
        rows.append(("spark", site, key, cls, why))
    if oracle:
        flat = _sql_flat(oracle)
        sdefs = _sql_defs(flat)
        base_types = _parquet_types()
        for site, key, pos in find_sql_cuts(flat):
            cls, why = _sql_classify(key, sdefs, base_types, pos=pos)
            rows.append(("oracle", site, key, cls, why))
    return rows


_PQ_TYPES: dict[str, str] = {}


def _parquet_types(sf_dir: str | None = None) -> dict[str, str]:
    if _PQ_TYPES or sf_dir is None:
        return _PQ_TYPES
    import pyarrow.parquet as pq

    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        try:
            sch = pq.read_schema(f"{sf_dir}/{t}.parquet")
        except OSError:
            continue
        for f in sch:
            s = str(f.type)
            _PQ_TYPES[f.name.lower()] = (
                "double" if s in ("double", "float") else
                "list" if s.startswith("list") else s
            )
    return _PQ_TYPES


def main() -> None:
    from mcpvectordb_spark.catalog import ORACLES, QUERIES
    from mcpvectordb_spark.session import get_spark
    from plan_report import SKIP

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    _parquet_types(sf_dir)
    spark = get_spark("rankkey-report")
    lines = [
        "# RANKKEYS — ranked-cut sort-key audit of every catalog query",
        "",
        f"Generated by `tools/rankkey_report.py` at `{sf_dir}` (r8 verdict",
        "item 1).  Every row-selecting cut — ORDER BY+LIMIT keys, rank-window",
        "order keys, float-threshold comparison operands — on BOTH engines is",
        "classified `rounded` (round()-disciplined), `exact` (integers,",
        "strings, decimal sums, per-row IEEE folds, stored columns), or",
        "`risky` (cross-row float sums/avgs, libm calls, opaque checkpoint",
        "floats).  A ✗ row carries a risky key without an ALLOW_RAW",
        "justification — none may exist.",
        "",
        "| query | cuts | rounded | exact | risky | flags |",
        "|---|---|---|---|---|---|",
    ]
    bad = []
    for name, fn in QUERIES.items():
        if name in SKIP:
            # build-time-executing / streaming queries: the Spark plan is
            # not worth driver work here (plan_report's rationale), but
            # their ORACLE SQL is pure text — scan that side so a raw
            # float cut in a digest-gold or stream-twin oracle still trips
            oracle = ORACLES.get(name)
            if not oracle:
                continue
            flat = _sql_flat(oracle)
            sdefs = _sql_defs(flat)
            rows = [
                ("oracle", site, key, *_sql_classify(key, sdefs,
                                                     _parquet_types(), pos=pos))
                for site, key, pos in find_sql_cuts(flat)
            ]
            risky = [r for r in rows if r[3] == "risky"]
            if risky and name not in ALLOW_RAW:
                detail = "; ".join(f"oracle/{r[1]}: {r[4] or r[2][:60]}"
                                   for r in risky[:3])
                bad.append((name, detail))
                lines.append(
                    f"| {name} (oracle only) | {len(rows)} | "
                    f"{sum(1 for r in rows if r[3] == 'rounded')} | "
                    f"{sum(1 for r in rows if r[3] == 'exact')} | "
                    f"{len(risky)} | ✗ RAW-FLOAT-CUT {detail} |"
                )
            else:
                lines.append(
                    f"| {name} (oracle only) | {len(rows)} | "
                    f"{sum(1 for r in rows if r[3] == 'rounded')} | "
                    f"{sum(1 for r in rows if r[3] == 'exact')} | "
                    f"{len(risky)} | "
                    f"{'raw-ok: ' + ALLOW_RAW[name] if risky else ''} |"
                )
            continue
        oracle = ORACLES.get(name)
        try:
            rows = audit_query(fn(spark, sf_dir), oracle)
        except Exception as exc:  # pragma: no cover - plan build failure
            bad.append((name, f"AUDIT ERROR: {type(exc).__name__}: {exc}"))
            lines.append(f"| {name} | - | - | - | - | ERROR |")
            continue
        n_round = sum(1 for r in rows if r[3] == "rounded")
        n_exact = sum(1 for r in rows if r[3] == "exact")
        risky = [r for r in rows if r[3] == "risky"]
        flags = []
        if risky and name in ALLOW_RAW:
            flags.append(f"raw-ok: {ALLOW_RAW[name]}")
        elif risky:
            detail = "; ".join(
                f"{r[0]}/{r[1]}: {r[4] or r[2][:60]}" for r in risky[:3]
            )
            flags.append(f"✗ RAW-FLOAT-CUT {detail}")
            bad.append((name, detail))
        elif name in ALLOW_RAW:
            flags.append("✗ STALE-ALLOWLIST")
            bad.append((name, "allowlisted but no risky site found"))
        lines.append(
            f"| {name} | {len(rows)} | {n_round} | {n_exact} | {len(risky)} |"
            f" {'; '.join(flags)} |"
        )
    lines += [
        "",
        "Rows marked `(oracle only)` are the build-time-executing /",
        "streaming queries whose Spark plan is skipped (plan_report's",
        f"SKIP rationale) but whose oracle SQL is still scanned: "
        f"{', '.join(sorted(SKIP))}.",
        "",
    ]
    with open("RANKKEYS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote RANKKEYS.md ({len(lines)} lines); flags: {bad if bad else 'none'}")
    spark.stop()
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
