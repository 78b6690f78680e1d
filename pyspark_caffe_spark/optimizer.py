"""Logical-plan rewrite rules — the engine-grade optimizer layer.

``rewrite_similarity_join`` pattern-matches the NAIVE all-pairs
cosine-threshold spelling a user writes without knowing the library::

    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"))
    dot = F.aggregate(F.zip_with("emb_a", "emb_b", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    naive = (a.crossJoin(b)
              .filter((F.round(dot, 6) >= tau) & (F.col("id_a") < F.col("id_b")))
              .select("id_a", "id_b", F.round(dot, 6).alias("cos")))

and rebuilds it as :func:`pyspark_caffe_spark.vecops.threshold_pairs`'
EXACT tiered plan (bounded broadcast-matrix tier under the row cap,
exact distributed block-pair tier above it — never the LSH tier,
whose approximate recall would change results) — so the user who does
NOT call the router still escapes the BroadcastNestedLoopJoin that
Catalyst would otherwise execute (measured 20.5 s at a mere 2k×2k,
BASELINE.md).

Why a Python-side rule and not a SparkSessionExtensions injection:
Catalyst rules must be JVM classes and this container has no Scala
toolchain to compile one, so the rule operates one level up — on the
ANALYZED logical plan reached through the DataFrame, using the same
machinery a JVM rule would (structural match on
Project/Filter/Join nodes, ``Expression.semanticEquals`` against a
canonical cosine template, ``LogicalPlan.sameResult`` to prove the
self-join). The match is CONSERVATIVE by construction: any deviation
from the proven pattern returns ``None`` and the naive plan runs
unchanged — the rule can decline, never miscompile.

Matched shape (all checks required):

    Project(outs, Filter(cond, Join(Project(C) as L, Project(C') as R)))

* join type Cross (or Inner with no condition) — the naive spelling;
* ``L.child.sameResult(R.child)`` — provably the SAME corpus scan
  (self-join), which is what the router computes;
* ``cond`` is exactly two conjuncts: ``round(dot(va, vb), d) >= lit``
  where the left side semantically equals the canonical zip_with/
  aggregate cosine template over one array column from each side, and
  an ``id_l < id_r`` ordering conjunct between one long column from
  each side (either ``<`` spelling);
* every output in ``outs`` is one of: the left id, the right id, or
  an alias of the SAME rounded-cosine expression;
* the id/vector aliases on both Projects resolve to the same base
  column names in C.

The rewrite preserves the result contract exactly: the router emits
(i<j) pairs with the ROUNDED cosine at the same ``d`` digits compared
against the same ``tau`` — the rounding requirement is why a raw
(unrounded) dot comparison is declined rather than rewritten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_caffe_spark import vecops


def _seq(jseq) -> list:
    """Materialize a Scala Seq reached over py4j."""
    return [jseq.apply(i) for i in range(jseq.size())]


def _cls(jobj) -> str:
    return jobj.getClass().getSimpleName()


def _conjuncts(expr) -> list:
    if _cls(expr) == "And":
        return _conjuncts(expr.left()) + _conjuncts(expr.right())
    return [expr]


def _of_rows(spark, jplan) -> DataFrame:
    from pyspark.sql.classic.dataframe import DataFrame as _CDF

    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, jplan
    )
    return _CDF(jdf, spark)


def _cosine_template(joined: DataFrame, va: str, vb: str, ndigits: int):
    """The analyzed JVM expression of our canonical rounded cosine over
    two array columns of ``joined`` — the template the user's filter
    expression must ``semanticEquals``."""
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    ref = joined.select(F.round(dot, ndigits).alias("_t"))
    return ref._jdf.queryExecution().analyzed().expressions().head().child()


def _alias_to_base(project, attr) -> str | None:
    """Resolve an output attribute of a Project node back to the base
    column NAME it projects (Alias-of-AttributeReference or a direct
    AttributeReference); None if it is any computed expression."""
    target = attr.exprId().id()
    for ne in _seq(project.projectList()):
        if ne.exprId().id() != target:
            continue
        kind = _cls(ne)
        if kind == "AttributeReference":
            return str(ne.name())
        if kind == "Alias" and _cls(ne.child()) == "AttributeReference":
            return str(ne.child().name())
        return None
    return None


def try_rewrite_similarity_join(df: DataFrame, **router_kwargs) -> DataFrame | None:
    """Return the routed equivalent of a naive cosine-threshold
    self-join, or ``None`` when the plan does not provably match (the
    caller then runs the original plan)."""
    spark = df.sparkSession
    root = df._jdf.queryExecution().analyzed()
    if _cls(root) != "Project":
        return None
    filt = root.child()
    if _cls(filt) != "Filter":
        return None
    join = filt.child()
    if _cls(join) != "Join":
        return None
    jtype = str(join.joinType().toString())
    if jtype not in ("Cross", "Inner") or join.condition().isDefined():
        return None
    jl, jr = join.left(), join.right()
    if _cls(jl) != "Project" or _cls(jr) != "Project":
        return None
    if not jl.child().sameResult(jr.child()):
        return None  # not a self-join: the router computes i<j over ONE corpus

    left_out, right_out = _seq(jl.output()), _seq(jr.output())
    names = [str(o.name()) for o in left_out + right_out]
    if len(set(names)) != len(names):
        return None  # ambiguous column names: template building unsafe
    left_ids = {o.exprId().id(): o for o in left_out}
    right_ids = {o.exprId().id(): o for o in right_out}

    conj = _conjuncts(filt.condition())
    if len(conj) != 2:
        return None
    thresh = next((c for c in conj if _cls(c) == "GreaterThanOrEqual"), None)
    order = next((c for c in conj if _cls(c) in ("LessThan", "GreaterThan")), None)
    if thresh is None or order is None:
        return None

    # --- ordering conjunct: id_left < id_right (either spelling) ---
    o_l, o_r = order.left(), order.right()
    if _cls(order) == "GreaterThan":  # idR > idL  ≡  idL < idR
        o_l, o_r = o_r, o_l
    if _cls(o_l) != "AttributeReference" or _cls(o_r) != "AttributeReference":
        return None
    if o_l.exprId().id() not in left_ids or o_r.exprId().id() not in right_ids:
        return None
    id_l, id_r = o_l, o_r

    # --- threshold conjunct: Round(dot, d) >= Literal ---
    lit = thresh.right()
    if _cls(lit) != "Literal" or str(lit.dataType().simpleString()) != "double":
        return None
    tau = float(str(lit.value()))
    cos_expr = thresh.left()
    if _cls(cos_expr) != "Round":
        return None  # unrounded compare: router rounds — semantics differ, decline
    scale = cos_expr.scale()
    if _cls(scale) != "Literal":
        return None
    ndigits = int(str(scale.value()))

    joined = _of_rows(spark, join)
    arr_left = [
        str(o.name())
        for o in left_out
        if str(o.dataType().simpleString()).startswith("array<")
    ]
    arr_right = [
        str(o.name())
        for o in right_out
        if str(o.dataType().simpleString()).startswith("array<")
    ]
    match = None
    for va in arr_left:
        for vb in arr_right:
            if cos_expr.semanticEquals(_cosine_template(joined, va, vb, ndigits)):
                match = (va, vb)
                break
        if match:
            break
    if match is None:
        return None
    va_name, vb_name = match

    # --- both Projects must alias the same base (id, vec) columns ---
    va_attr = next(o for o in left_out if str(o.name()) == va_name)
    vb_attr = next(o for o in right_out if str(o.name()) == vb_name)
    base_id_l = _alias_to_base(jl, id_l)
    base_id_r = _alias_to_base(jr, id_r)
    base_vec_l = _alias_to_base(jl, va_attr)
    base_vec_r = _alias_to_base(jr, vb_attr)
    if None in (base_id_l, base_id_r, base_vec_l, base_vec_r):
        return None
    if base_id_l != base_id_r or base_vec_l != base_vec_r:
        return None

    # --- output projection: only ids and the rounded cosine ---
    out_map: list[tuple[str, str]] = []  # (routed col, output name)
    for ne in _seq(root.projectList()):
        kind = _cls(ne)
        name = str(ne.name())
        if kind == "AttributeReference":
            if ne.exprId().id() == id_l.exprId().id():
                out_map.append(("id_a", name))
            elif ne.exprId().id() == id_r.exprId().id():
                out_map.append(("id_b", name))
            else:
                return None
        elif kind == "Alias":
            child = ne.child()
            if _cls(child) == "AttributeReference":
                if child.exprId().id() == id_l.exprId().id():
                    out_map.append(("id_a", name))
                elif child.exprId().id() == id_r.exprId().id():
                    out_map.append(("id_b", name))
                else:
                    return None
            elif child.semanticEquals(cos_expr):
                out_map.append(("cos", name))
            else:
                return None
        else:
            return None

    base = _of_rows(spark, jl.child()).select(base_id_l, base_vec_l)
    # A rewrite rule must be SEMANTICS-PRESERVING at every scale, so it
    # routes to threshold_pairs (exact broadcast tier → exact
    # distributed block-pair tier over the cap), NEVER to the LSH tier:
    # auto_threshold_pairs' banded route has approximate recall, which
    # is a fine opt-IN router trade-off but would make this rewrite
    # silently drop qualifying pairs exactly at the scale it targets.
    routed = vecops.threshold_pairs(
        base, tau=tau, vec_col=base_vec_l, id_col=base_id_l,
        ndigits=ndigits, **router_kwargs,
    )
    cols: list[Column] = [F.col(src).alias(dst) for src, dst in out_map]
    return routed.select(*cols)


def rewrite_similarity_join(df: DataFrame, **router_kwargs) -> DataFrame:
    """``try_rewrite_similarity_join`` with pass-through: the input plan
    is returned unchanged when the pattern does not match."""
    out = try_rewrite_similarity_join(df, **router_kwargs)
    return df if out is None else out
