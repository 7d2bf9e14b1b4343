package graft

import graft.core.{AutoExplore, ExplainFrame, QueryRecommender}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end replay of the reference's example-notebook FLOWS through
  * the library's user surface — USER-visible parity, not per-operator
  * parity (the per-operator oracle already covers the latter).
  *
  * Mirrored flows (cell order preserved, our tables standing in for the
  * CSV datasets):
  *  - Examples/Notebooks/Fedex Explainer Examples/Adults Dataset
  *    Demo.ipynb: load → groupby().mean().explain(top_k=4,
  *    use_sampling=True) → filter.explain(top_k=4) → filter →
  *    value_counts() → groupby().col.count().explain(explainer=
  *    'outlier', target=…, dir='high').
  *  - Examples/Notebooks/LLM Features Examples/… Query Recommender +
  *    Automated Exploration: recommend follow-up queries off a flow
  *    frame, apply the top one, auto-explore — the deterministic
  *    equivalents (QueryRecommender / AutoExplore) of the reference's
  *    LLM-backed loops.
  *
  * Every cell's OUTPUT is asserted: shape, ordering contract, score
  * finiteness, cross-checks against directly-computed truths, and
  * whole-flow run-twice determinism (the reference notebooks re-run to
  * identical cells; so must we).
  */
class NotebookParitySpec extends AnyFunSuite {
  import TestSession._

  /** The Adults-demo cells, returning each cell's collected output. */
  private def adultsFlow(): Seq[Array[Row]] = {
    // cells 1-2: import + load (adults := customer)
    val adults = ExplainFrame(graft.util.D.t(spark, sf, "customer"), "customer")
    // cell 3: by_income = adults.groupby('workclass').mean()
    //         by_income.explain(top_k=4, use_sampling=True)
    val byIncome = adults.groupBy("c_nationkey").mean("c_acctbal")
    val ex1 = byIncome.explain(topK = 4, useSampling = true).collect()
    // cells 4-5: low_income = adults[adults['label'] == '<=50K']
    //            low_income.explain(top_k=4)
    val lowIncome = adults.filter(col("c_mktsegment") === "BUILDING")
    val ex2 = lowIncome.explain(topK = 4, useSampling = false).collect()
    // cell 6: thirties = adults[adults['age'] >= 70]
    //         thirties['label'].value_counts()
    val seniors = adults.filter(col("c_acctbal") >= 5000)
    val vc = seniors.valueCounts("c_mktsegment").collect()
    // cells 7-8: young_by_income = thirties.groupby('education').age.count()
    //            young_by_income.explain(explainer='outlier', target=…, dir='high')
    // (the notebook targets a literal group; the fixture-stable pick is
    // the value_counts leader — same kind of "a group I just saw" choice.
    // Counting c_custkey = the notebook's count-a-column shape while
    // leaving c_acctbal free as the default numeric outlier attribute —
    // customer's only non-key numeric, like 'age' on adults)
    val bySeg = seniors.groupBy("c_mktsegment").agg("c_custkey" -> "count")
    val ex3 = bySeg.explain(explainer = "outlier",
      target = vc.head.getString(0), dir = "high").collect()
    Seq(ex1, ex2, vc, ex3)
  }

  test("Adults notebook flow: every cell yields its contracted output; whole flow is run-twice deterministic") {
    val out = adultsFlow()
    val Seq(ex1, ex2, vc, ex3) = out

    // cell 3 (groupby exceptionality): ≤4 rows, zdev finite + desc
    assert(ex1.nonEmpty && ex1.length <= 4)
    val zdevs = ex1.map(r => r.getDouble(r.fieldIndex("zdev"))).toSeq
    assert(zdevs.forall(z => !z.isNaN && !z.isInfinite))
    assert(zdevs === zdevs.sorted(Ordering[Double].reverse), "zdev must be ranked desc")

    // cell 5 (filter fedex): ≤4 rows, kl_score finite + desc, and the
    // reference's one-sentence rendering works off the top row
    assert(ex2.nonEmpty && ex2.length <= 4)
    val kls = ex2.map(r => r.getDouble(r.fieldIndex("kl_score"))).toSeq
    assert(kls.forall(k => !k.isNaN && !k.isInfinite))
    assert(kls === kls.sorted(Ordering[Double].reverse), "kl_score must be ranked desc")
    val adults = ExplainFrame(graft.util.D.t(spark, sf, "customer"), "customer")
    val lowIncome = adults.filter(col("c_mktsegment") === "BUILDING")
    val sentence = lowIncome.explanationText(ex2.head)
    assert(sentence.nonEmpty &&
      sentence.contains(ex2.head.getString(ex2.head.fieldIndex("attribute"))))

    // cell 6 (value_counts): counts desc, shares sum to ~1, and the
    // counts equal a directly-computed truth
    assert(vc.nonEmpty)
    val cnts = vc.map(_.getLong(1)).toSeq
    assert(cnts === cnts.sorted(Ordering[Long].reverse))
    assert(math.abs(vc.map(_.getDouble(2)).sum - 1.0) < 1e-6)
    val truth = graft.util.D.t(spark, sf, "customer")
      .filter(col("c_acctbal") >= 5000)
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    vc.foreach(r => assert(truth(r.getString(0)) === r.getLong(1)))

    // cell 8 (outlier explainer): influence desc over (attribute, bin)
    // predicates, all finite
    assert(ex3.nonEmpty)
    val infl = ex3.map(r => r.getDouble(r.fieldIndex("influence"))).toSeq
    assert(infl.forall(x => !x.isNaN && !x.isInfinite))
    assert(infl === infl.sorted(Ordering[Double].reverse), "influence must be ranked desc")

    // the whole flow re-runs to identical cells
    val again = adultsFlow()
    out.zip(again).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"flow cell $i diverged between runs")
    }
  }

  /** The Outlier Explainer demo cells (Examples/Notebooks/Outlier
    * Explainer Examples/Bank Churners Dataset Outlier Explainer
    * Demo.ipynb): load → describe() → groupby(cat).count().explain(
    * outlier, high) → filter → value_counts → groupby.count().explain(
    * outlier, high) → numeric filter → groupby.mean().explain(
    * use_sampling) → .explain(outlier, numeric target, low). */
  private def churnersFlow(): Seq[Array[Row]] = {
    // bank_all := orders; Income_Category := o_orderpriority
    val bank = ExplainFrame(graft.util.D.t(spark, sf, "orders"), "orders")
    val desc = bank.describeStats(Seq("o_totalprice")).collect()
    val byCat = bank.groupBy("o_orderpriority").agg("o_orderkey" -> "count")
    val ex1 = byCat.explain(explainer = "outlier",
      target = "1-URGENT", dir = "high").collect()
    // females := o_orderstatus == 'F'
    val females = bank.filter(col("o_orderstatus") === "F")
    val vc = females.valueCounts("o_orderpriority").collect()
    val ex2 = females.groupBy("o_orderpriority").agg("o_orderkey" -> "count")
      .explain(explainer = "outlier", target = "1-URGENT", dir = "high").collect()
    // younger := numeric filter; limit_by_age := groupby.mean() — on
    // lineitem, the numeric-rich frame (the notebook's dataset has many
    // numerics; orders has only o_totalprice, which the mean consumes)
    val li = ExplainFrame(graft.util.D.t(spark, sf, "lineitem"), "lineitem")
    val younger = li.filter(col("l_quantity") <= 40)
    val limitByAge = younger.groupBy("l_linenumber").mean("l_extendedprice")
    val ex3 = limitByAge.explain(topK = 3, useSampling = true).collect()
    val ex4 = limitByAge.explain(explainer = "outlier",
      target = "3", dir = "low").collect()
    Seq(desc, ex1, vc, ex2, ex3, ex4)
  }

  test("Bank-Churners outlier notebook flow: describe, two outlier-high cells, sampling fedex, outlier-low on a numeric group") {
    val out = churnersFlow()
    val Seq(desc, ex1, vc, ex2, ex3, ex4) = out
    // describe(): one profile row per column carrying the pandas core
    // stats (count/mean/std/min/max), n consistent with the frame
    assert(desc.length === 1)
    val d0 = desc.head
    assert(Set("col", "n", "mean", "std", "min_v", "max_v")
      .subsetOf(d0.schema.fieldNames.toSet))
    assert(d0.getAs[String]("col") === "o_totalprice" && d0.getAs[Long]("n") > 0)
    assert(d0.getAs[Double]("min_v") <= d0.getAs[Double]("mean") &&
      d0.getAs[Double]("mean") <= d0.getAs[Double]("max_v"))
    // both outlier-high cells: influence ranked desc, finite
    for ((ex, i) <- Seq(ex1 -> 1, ex2 -> 3)) {
      assert(ex.nonEmpty, s"cell $i outlier explanation must be non-empty")
      val infl = ex.map(r => r.getDouble(r.fieldIndex("influence"))).toSeq
      assert(infl.forall(x => !x.isNaN && !x.isInfinite))
      assert(infl === infl.sorted(Ordering[Double].reverse))
    }
    // value_counts on the filtered frame equals a direct recount
    val truth = graft.util.D.t(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    vc.foreach(r => assert(truth(r.getString(0)) === r.getLong(1)))
    // the sampled groupby fedex cell: zdev contract
    assert(ex3.nonEmpty && ex3.length <= 3)
    val zs = ex3.map(r => r.getDouble(r.fieldIndex("zdev"))).toSeq
    assert(zs === zs.sorted(Ordering[Double].reverse))
    // outlier-low with a NUMERIC group target (the notebook's target=26)
    assert(ex4.nonEmpty)
    // whole-flow determinism
    val again = churnersFlow()
    out.zip(again).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"churners flow cell $i diverged between runs")
    }
  }

  /** The MetaInsight demo cells (Examples/Notebooks/MetaInsight
    * Explainer (Beta) Examples/MetaInsight Explainer (Beta) Demo.ipynb):
    * load → numeric filter → .explain(metainsight) auto mode →
    * groupby().mean() → .explain(metainsight) → full-scope call with
    * filter_columns + groupby_columns + aggregations +
    * use_all_groupby_combinations. */
  private def metaInsightFlow(): Seq[Array[Row]] = {
    val adults = ExplainFrame(graft.util.D.t(spark, sf, "orders"), "orders")
    val over30 = adults.filter(col("o_totalprice") > 100000)
    val m1 = over30.explain(explainer = "metainsight").collect()
    // the notebook's by_race_sex cell: a TWO-key groupby result carries
    // two dimensions, so auto-search has scopes to mine (its single-key
    // by_marital_status sibling has only one — see the fail-loud pin in
    // the test body)
    val byStatusPrio = adults.groupBy("o_orderstatus", "o_orderpriority")
      .mean("o_totalprice")
    val m2 = byStatusPrio.explain(explainer = "metainsight").collect()
    // full-scope call on the numeric-rich frame (lineitem), the same
    // scope family the registered q_metainsight_multi exercises; the
    // notebook's min_commonness stays at the reference default except
    // where the tiny test SF leaves too few common patterns
    val li = ExplainFrame(graft.util.D.t(spark, sf, "lineitem"), "lineitem")
    val m3 = li.explain(explainer = "metainsight", topK = 5,
      filterColumns = Seq("l_returnflag"),
      groupbyColumns = Seq("l_linestatus", "l_linenumber"),
      aggregations = Seq("l_quantity", "l_extendedprice"),
      minCommonness = 0.15,
      useAllGroupbyCombinations = true).collect()
    Seq(m1, m2, m3)
  }

  test("MetaInsight notebook flow: auto mode on a filtered frame, on a groupby result, and a full-scope call") {
    val out = metaInsightFlow()
    val Seq(m1, m2, m3) = out
    // auto mode on the filtered frame mines real scopes with ranked
    // scores; the score column is the mining objective, ranked desc
    assert(m1.nonEmpty, "auto metainsight on the filtered frame must mine patterns")
    def scores(rs: Array[Row]): Seq[Double] = {
      val f = rs.head.schema.fieldNames.find(n => n == "score" || n.endsWith("score")).get
      rs.map(r => r.getDouble(r.fieldIndex(f))).toSeq
    }
    assert(scores(m1) === scores(m1).sorted(Ordering[Double].reverse))
    // the two-key groupby result mines real patterns (the notebook's
    // by_race_sex cell)
    assert(m2.nonEmpty, "metainsight on the two-key groupby result must mine patterns")
    // the single-key sibling (by_marital_status) has one dimension and
    // therefore zero (filterDim, breakdown) scopes — our engine fails
    // loud on that rather than returning a vacuous table
    val adults = ExplainFrame(graft.util.D.t(spark, sf, "orders"), "orders")
    val oneDim = adults.groupBy("o_orderstatus").mean("o_totalprice")
    val e = intercept[IllegalArgumentException](
      oneDim.explain(explainer = "metainsight").collect())
    assert(e.getMessage.contains("pattern table"))
    // the full-scope call returns ≤ top_k ranked patterns
    assert(m3.nonEmpty && m3.length <= 5)
    assert(scores(m3) === scores(m3).sorted(Ordering[Double].reverse))
    // run-twice determinism across the whole flow
    val again = metaInsightFlow()
    out.zip(again).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"metainsight flow cell $i diverged between runs")
    }
  }

  test("Many-to-One notebook comparison: disjunctive rules dominate conjunctive rules on the shared lattice") {
    // Examples/Notebooks/Many to One Explainer Examples/Many To One
    // Explainer - disjunctive explanations vs conjunctive explanations
    // comparison.ipynb: the same frame explained with explanation_form=
    // 'conj' then 'disj' at one separation budget, outputs compared.
    // The lattice fact the notebook measures empirically holds rowwise
    // here BY CONSTRUCTION: (A ∨ B) ⊇ (A ∧ B), so for every shared
    // (label, val_a, val_b) cell the disjunction's match count and
    // coverage must dominate the conjunction's.
    import graft.explain.ManyToOne
    val cust = graft.util.D.t(spark, sf, "customer")
    val conj = ManyToOne.explainConj(cust, "c_mktsegment",
      "c_nationkey", "c_acctbal", 0.3, 0.95, 10).collect()
    val disj = ManyToOne.explainDisj(cust, "c_mktsegment",
      "c_nationkey", "c_acctbal", covTh = 0.3, sepTh = 0.95).collect()
    assert(conj.nonEmpty && disj.nonEmpty)
    def key(r: Row) = (r.getAs[String]("label"),
      r.getAs[String]("val_a"), r.getAs[String]("val_b"))
    val cm = conj.map(r => key(r) ->
      (r.getAs[Long]("n_match"), r.getAs[Double]("coverage"))).toMap
    var compared = 0
    disj.foreach { r =>
      cm.get(key(r)).foreach { case (nc, cc) =>
        compared += 1
        assert(r.getAs[Long]("n_match") >= nc,
          s"disj must match at least the conj rows at ${key(r)}")
        assert(r.getAs[Double]("coverage") >= cc - 1e-9,
          s"disj coverage must dominate conj coverage at ${key(r)}")
      }
    }
    assert(compared > 0, "the two forms must share lattice cells to compare")
    // the disjunctive form finds passing rules at thresholds where the
    // stricter conjunctions do not (the notebook's empirical headline:
    // disj trades separation for coverage) — at this tiny SF no
    // conjunction clears 30% label coverage, every rule is still scored
    assert(disj.exists(_.getAs[Int]("passes") == 1))
    assert(conj.forall(r => r.getAs[Double]("coverage") >= 0.0 &&
      r.getAs[Double]("separation_err") >= 0.0))
    // the unified dispatch exposes the disj form (the notebook's
    // explanation_form kwarg) and returns the library function's rows
    val viaDispatch = ExplainFrame(cust, "customer")
      .explain("many_to_one", labelCol = "c_mktsegment",
        catAttrs = Seq("c_nationkey"), numAttrs = Seq("c_acctbal"),
        coverageThreshold = 0.3, separationThreshold = 0.95,
        explanationForm = "disj").collect()
    assert(viaDispatch.map(_.toString).toSeq === disj.map(_.toString).toSeq)
  }

  /** The Spotify Demo 2 cells (Examples/Notebooks/Fedex Explainer
    * Examples/Spotify Dataset Demo 2.ipynb) — the JOIN-explainer
    * notebook: load → numeric filter → .explain() → year filter →
    * groupby(decade).popularity.mean() → .explain() → .explain(outlier,
    * low) → per-artist count → values>N index filter (isin) →
    * groupby(artist).popularity.mean() → value filter → category filter
    * → b_join(on=artist) → explain consider='right'. orders stands in
    * for songs (popularity := o_totalprice, main_artist := o_custkey,
    * decade := o_orderpriority). */
  private def spotifyJoinFlow(): Seq[Array[Row]] = {
    // lineitem stands in (the numeric-rich frame, like the songs CSV:
    // popularity := l_extendedprice, main_artist := l_suppkey, decade :=
    // l_returnflag, year := l_shipdate, acousticness := l_discount) —
    // the outlier cell needs numeric attributes left over after the
    // mean consumes one, which orders does not have
    val songs = ExplainFrame(graft.util.D.t(spark, sf, "lineitem"), "lineitem")
    // popular_songs_df = songs_df[popularity > 65]; .explain()
    val popular = songs.filter(col("l_extendedprice") > 80000)
    val ex1 = popular.explain().collect()
    // new_songs_df = songs_df[year >= 1990]
    // gb_decade = new_songs_df.groupby('decade').popularity.mean(); .explain()
    val recent = songs.filter(
      col("l_shipdate").cast("date") >= lit("1995-01-01").cast("date"))
    val gbDecade = recent.groupBy("l_returnflag").mean("l_extendedprice")
    val ex2 = gbDecade.explain().collect()
    // gb_decade.explain(explainer='outlier', target=2020, dir='low')
    val ex3 = gbDecade.explain(explainer = "outlier",
      target = "R", dir = "low").collect()
    // count_artist = songs.groupby(artist).count(); [values > 100].index
    val countArtist = songs.groupBy("l_suppkey").count()
    val hot = countArtist.df.filter(col("l_suppkey_count") >= 600)
      .select("l_suppkey").collect().map(_.getLong(0)).toSeq
    // frequent_df = songs[artist.isin(count_artist.index)]
    val frequent = songs.filter(col("l_suppkey").isin(hot: _*))
    // gb_artist_popularity = frequent.groupby(artist).popularity.mean();
    // then [values > 60]
    val gbArtist = frequent.groupBy("l_suppkey").mean("l_extendedprice")
      .filter(col("l_extendedprice_mean") > 53000)
    // acoustic_df = frequent[acousticness > 0.95]
    val acoustic = frequent.filter(col("l_discount") > 0.05)
    // acoustic_df.b_join(gb_artist_popularity, on=artist,
    //                    explain=True, consider='right')
    val joined = acoustic.join(gbArtist, on = Seq("l_suppkey"))
    val ex4 = joined.explain(topK = 3).collect() // consider='right' default
    Seq(ex1, ex2, ex3, ex4)
  }

  test("Spotify join-explainer notebook flow: filter/groupby cells, isin tail, and the b_join explain considering the right side") {
    val out = spotifyJoinFlow()
    val Seq(ex1, ex2, ex3, ex4) = out
    // filter fedex: ranked desc, finite
    assert(ex1.nonEmpty && ex1.length <= 3)
    val kls = ex1.map(r => r.getDouble(r.fieldIndex("kl_score"))).toSeq
    assert(kls.forall(k => !k.isNaN && !k.isInfinite))
    assert(kls === kls.sorted(Ordering[Double].reverse))
    // groupby fedex: zdev ranked desc
    assert(ex2.nonEmpty && ex2.length <= 3)
    val zs = ex2.map(r => r.getDouble(r.fieldIndex("zdev"))).toSeq
    assert(zs === zs.sorted(Ordering[Double].reverse))
    // outlier-low on the groupby result: influence ranked desc, finite
    assert(ex3.nonEmpty)
    val infl = ex3.map(r => r.getDouble(r.fieldIndex("influence"))).toSeq
    assert(infl.forall(x => !x.isNaN && !x.isInfinite))
    assert(infl === infl.sorted(Ordering[Double].reverse))
    // the join explain considers the RIGHT side: the only explainable
    // right attribute is the joined-in mean (join key excluded), so
    // every explanation row must be about it
    assert(ex4.nonEmpty && ex4.length <= 3)
    ex4.foreach(r => assert(
      r.getString(r.fieldIndex("attribute")) === "l_extendedprice_mean",
      "join explain must score the right side's non-key attribute"))
    val jkls = ex4.map(r => r.getDouble(r.fieldIndex("kl_score"))).toSeq
    assert(jkls.forall(k => !k.isNaN && !k.isInfinite))
    // consider='left' flips the explained side to the left frame's attrs
    val songs = ExplainFrame(graft.util.D.t(spark, sf, "lineitem"), "lineitem")
    val hot2 = songs.groupBy("l_suppkey").count().df
      .filter(col("l_suppkey_count") >= 600)
      .select("l_suppkey").collect().map(_.getLong(0)).toSeq
    val frequent2 = songs.filter(col("l_suppkey").isin(hot2: _*))
    val gbArtist2 = frequent2.groupBy("l_suppkey").mean("l_extendedprice")
      .filter(col("l_extendedprice_mean") > 53000)
    val left = frequent2.filter(col("l_discount") > 0.05)
      .join(gbArtist2, on = Seq("l_suppkey"))
      .explainFedex(topK = 3, consider = "left").collect()
    assert(left.nonEmpty)
    left.foreach(r => assert(
      r.getString(r.fieldIndex("attribute")) !== "l_extendedprice_mean"))
    // whole-flow determinism
    val again = spotifyJoinFlow()
    out.zip(again).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"spotify join flow cell $i diverged between runs")
    }
  }

  /** The MetaInsight demo replayed on a SECOND dataset (events standing
    * in for adults; the notebook's own cells run against one CSV — the
    * flow contract must not be an artifact of one table's shape): load
    * with a derived weekday dimension (the Spotify notebooks derive
    * 'decade' the same way at load) → numeric filter → auto metainsight
    * → two-key groupby().mean() → metainsight → full-scope manual call. */
  private def metaInsightEventsFlow(): Seq[Array[Row]] = {
    val ev0 = graft.util.D.t(spark, sf, "events")
      .withColumn("weekday", date_format(col("ts"), "EEEE"))
      .select("event_type", "weekday", "value")
    val events = ExplainFrame(ev0, "events")
    val m1 = events.filter(col("value") > 0)
      .explain(explainer = "metainsight").collect()
    val byTypeDay = events.groupBy("event_type", "weekday").mean("value")
    val m2 = byTypeDay.explain(explainer = "metainsight").collect()
    val m3 = events.explain(explainer = "metainsight", topK = 5,
      filterColumns = Seq("event_type"),
      groupbyColumns = Seq("weekday"),
      aggregations = Seq("value"),
      minCommonness = 0.15).collect()
    Seq(m1, m2, m3)
  }

  test("MetaInsight notebook flow on a second dataset: same cells, events table, dims confined to the provided scopes") {
    val out = metaInsightEventsFlow()
    val Seq(m1, m2, m3) = out
    def scores(rs: Array[Row]): Seq[Double] =
      rs.map(r => r.getDouble(r.fieldIndex("score"))).toSeq
    assert(m1.nonEmpty, "auto metainsight on the filtered events frame must mine patterns")
    assert(scores(m1) === scores(m1).sorted(Ordering[Double].reverse))
    // auto mode derives its dims from the frame itself: every mined
    // pattern's scope stays inside the frame's two string dimensions
    val dims = Set("event_type", "weekday")
    m1.foreach { r =>
      assert(dims.contains(r.getString(r.fieldIndex("filter_dim"))))
      assert(dims.contains(r.getString(r.fieldIndex("breakdown"))))
    }
    assert(m2.nonEmpty, "metainsight on the two-key groupby result must mine patterns")
    assert(scores(m2) === scores(m2).sorted(Ordering[Double].reverse))
    // the manual full-scope call: ≤ top_k ranked patterns, scope exactly
    // as provided
    assert(m3.nonEmpty && m3.length <= 5)
    assert(scores(m3) === scores(m3).sorted(Ordering[Double].reverse))
    m3.foreach { r =>
      assert(r.getString(r.fieldIndex("filter_dim")) === "event_type")
      assert(r.getString(r.fieldIndex("breakdown")) === "weekday")
      // the explainer mines the provided aggregation (surfaced as its
      // mean measure) AND the implicit count measure over the same scope
      assert(Set("value_mean", "row_count").contains(r.getString(r.fieldIndex("measure"))))
    }
    val again = metaInsightEventsFlow()
    out.zip(again).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"events metainsight flow cell $i diverged between runs")
    }
  }

  test("recommender + auto-explore notebook tail runs off the flow's frames") {
    // the recommender needs ≥2 numeric non-key attributes for a 3-deep
    // ranking — lineitem (quantity, extendedprice, discount, tax) is
    // that frame here, standing in for the recommender notebook's own
    // dataset
    val li = ExplainFrame(graft.util.D.t(spark, sf, "lineitem"), "lineitem")
    val urgent = li.filter(col("l_returnflag") === "R")

    // Query Recommender notebook: recommend top-3 follow-ups, ranked
    // desc; the displayed query round-trips structurally (attr/op/
    // threshold fields, not string parsing), and applying the top
    // candidate yields a runnable frame whose re-score reproduces the
    // ranking's score
    val recs = QueryRecommender.recommendCandidates(urgent, topK = 3)
    assert(recs.size === 3)
    val scores = recs.map(_._2)
    assert(scores === scores.sorted(Ordering[Double].reverse))
    val (top, topScore) = recs.head
    assert(top.display === s"${top.attr} ${top.op} ${top.threshold}")
    assert(top.frame.df.count() >= 0L)
    assert(QueryRecommender.score(top.frame) === topScore,
      "re-scoring the applied candidate must reproduce its ranked score")

    // Automated Exploration notebook: a 2-iteration exploration off the
    // same frame produces a deterministic mixed-step report
    val ef = ExplainFrame(graft.util.D.t(spark, sf, "customer")
      .select("c_acctbal", "c_nationkey", "c_mktsegment"), "customer")
    val r1 = AutoExplore.explore(ef, iterations = 2).steps
      .map(s => (s.iteration, s.kind, s.query, s.score))
    val r2 = AutoExplore.explore(ef, iterations = 2).steps
      .map(s => (s.iteration, s.kind, s.query, s.score))
    assert(r1.nonEmpty && r1 === r2, "auto-exploration must be deterministic")
  }

  /** The FIRST Spotify fedex demo (Examples/Notebooks/Fedex Explainer
    * Examples/Spotify Dataset Demo.ipynb — the join-explainer flow above
    * replays `Spotify Dataset Demo 2`): filter.explain(top_k=2) →
    * decade groupby mean + outlier(dir='low') → derived boolean artist
    * column (the apply cell) + value_counts → drop_duplicates →
    * inner join → per-artist mean/count → explain(explainer='shapley',
    * value='mean', attr=…, consider='left', top_k=3) → re-explains →
    * operation introspection (`operation.type` / `source_name`).
    * songs := lineitem; popularity := l_extendedprice; decade :=
    * shipdate decade; 'Is By artist' := l_returnflag == 'R';
    * main_artist := l_suppkey. */
  private def spotifyFedexFlow(): Seq[Array[Row]] = {
    val songs = ExplainFrame(graft.util.D.t(spark, sf, "lineitem")
      .withColumn("decade",
        (floor(year(col("l_shipdate")) / 10) * 10).cast("long")), "songs")
    // cell: popular_songs = songs[popularity > 65]; .explain(top_k=2)
    val popular = songs.filter(col("l_extendedprice") > 30000)
    val ex1 = popular.explain(topK = 2, useSampling = false).collect()
    // cells: new_songs = songs[year >= 1990]; gb_decade = groupby mean
    val newSongs = songs.filter(year(col("l_shipdate")) >= 1995)
    val gbDecade = newSongs.groupBy("decade").mean("l_extendedprice")
    val decades = gbDecade.df.collect()
    // cell: gb_decade.explain(explainer='outlier', target=2020, dir='low')
    val loDecade = decades.map(_.getLong(0)).min.toString
    val ex2 = gbDecade.explain(explainer = "outlier", target = loDecade,
      dir = "low").collect()
    // cell: the apply() that derives the boolean artist column + its
    // value_counts — a scan-local derived column here, no driver loop
    val songs2 = songs.select(col("*"), (col("l_returnflag") === "R").as("is_by_artist"))
    val vc = songs2.valueCounts("is_by_artist").collect()
    // cells: collaborators = [..][['main_artist']].drop_duplicates();
    //        artist_songs = collaborators.join(songs[is_by], how='inner')
    val byArtist = songs2.filter(col("is_by_artist"))
    val collaborators = byArtist.select(col("l_suppkey")).dropDuplicates()
    val artistSongs = collaborators.join(byArtist, on = Seq("l_suppkey"))
    // cells: groupby('main_artist').popularity.mean() / .count()
    val perArtistMean = artistSongs.groupBy("l_suppkey").mean("l_extendedprice").df.collect()
    val perArtistCnt = artistSongs.groupBy("l_suppkey").count().df.collect()
    // cell: .explain(explainer='shapley', value='mean',
    //                attr='popularity', consider='left', top_k=3)
    val exS = artistSongs.explain(explainer = "shapley", value = "mean",
      attr = "l_extendedprice", consider = "left", useSampling = false).collect()
    // cells: popular.explain(top_k=3) and the outlier re-run
    val ex1b = popular.explain(topK = 3, useSampling = false).collect()
    val ex2b = gbDecade.explain(explainer = "outlier", target = loDecade,
      dir = "low").collect()
    Seq(ex1, ex2, vc, perArtistMean, perArtistCnt, exS, ex1b, ex2b)
  }

  test("Spotify fedex notebook flow: derived artist column, dedup join, shapley cell, operation introspection") {
    val out = spotifyFedexFlow()
    val Seq(ex1, ex2, vc, perArtistMean, perArtistCnt, exS, ex1b, ex2b) = out
    // filter fedex at top_k=2: ranked desc, finite
    assert(ex1.nonEmpty && ex1.length <= 2)
    val kls = ex1.map(r => r.getDouble(r.fieldIndex("kl_score"))).toSeq
    assert(kls.forall(k => !k.isNaN && !k.isInfinite))
    assert(kls === kls.sorted(Ordering[Double].reverse))
    // the top_k=3 re-explain extends the top_k=2 ranking (same cells,
    // wider K — the notebook re-runs the same explain with more figures)
    assert(ex1b.length >= ex1.length)
    assert(ex1b.take(ex1.length).map(_.toString).toSeq === ex1.map(_.toString).toSeq)
    // outlier-low on the decade groupby: influence desc + finite, and
    // the re-run cell is identical
    assert(ex2.nonEmpty)
    val infl = ex2.map(r => r.getDouble(r.fieldIndex("influence"))).toSeq
    assert(infl.forall(x => !x.isNaN && !x.isInfinite))
    assert(infl === infl.sorted(Ordering[Double].reverse))
    assert(ex2b.map(_.toString).toSeq === ex2.map(_.toString).toSeq)
    // value_counts of the derived boolean: exactly the two truth counts
    val truth = graft.util.D.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag") === "R").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(vc.map(r => r.getBoolean(0) -> r.getLong(1)).toMap === truth)
    // the dedup join keeps exactly the flagged songs (1:1 on the key set)
    assert(perArtistCnt.map(_.getLong(1)).sum ===
      truth(true), "join must keep each flagged song exactly once")
    assert(perArtistMean.length === perArtistCnt.length)
    // shapley cell: only the pinned attribute, finite scores, and the
    // Shapley EFFICIENCY property — the per-bin attributions sum to the
    // attribute's fedex deviation score on the same join
    assert(exS.nonEmpty)
    exS.foreach(r => assert(r.getString(r.fieldIndex("attribute")) === "l_extendedprice"))
    val shap = exS.map(r => r.getDouble(r.fieldIndex("shapley")))
    assert(shap.forall(s => !s.isNaN && !s.isInfinite))
    val songs2 = {
      val songs = ExplainFrame(graft.util.D.t(spark, sf, "lineitem")
        .withColumn("decade",
          (floor(year(col("l_shipdate")) / 10) * 10).cast("long")), "songs")
      songs.select(col("*"), (col("l_returnflag") === "R").as("is_by_artist"))
    }
    val byArtist = songs2.filter(col("is_by_artist"))
    val joined = byArtist.select(col("l_suppkey")).dropDuplicates()
      .join(byArtist, on = Seq("l_suppkey"))
    val dev = joined.explainFedex(attributes = Seq("l_extendedprice"), topK = 1)
      .collect()
    assert(dev.nonEmpty)
    val klScore = dev.head.getDouble(dev.head.fieldIndex("kl_score"))
    assert(math.abs(shap.sum - klScore) < 1e-9,
      s"shapley attributions (${shap.sum}) must sum to the fedex deviation ($klScore)")
    // the notebook's final introspection cell: operation type + source
    val songs = ExplainFrame(graft.util.D.t(spark, sf, "lineitem"), "songs")
    val popular = songs.filter(col("l_extendedprice") > 30000)
    assert(popular.op.exists(_.describe.startsWith("filter")))
    assert(popular.name === "songs")
    // whole-flow determinism
    val again = spotifyFedexFlow()
    out.zip(again).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"spotify fedex flow cell $i diverged between runs")
    }
  }

  /** The Bank Churners FEDEX demo (Examples/Notebooks/Fedex Explainer
    * Examples/Bank Churners Dataset Demo.ipynb — distinct from the
    * OUTLIER demo replayed above): where() filter + explain(attributes=
    * […], show_scores) → loyal/churn split → mean-threshold filter
    * (the x = loyal[col].mean() cell) + explain(top_k=3) → multi-agg
    * groupby ({col: [mean, max], col2: mean}) explain(top_k=2,
    * use_sampling=False) → three-column groupby mean explain(top_k=5) →
    * custom aggregation (count-over-threshold reduce) via a derived
    * column + sum, explain(show_scores). bank := lineitem;
    * Attrition_Flag := l_returnflag ('N' = existing);
    * Customer_Age := l_quantity; Total_Count_Change := l_discount;
    * Credit_Limit := l_extendedprice; Credit_Used := l_tax;
    * Marital_Status := l_linestatus; Education_Level := l_linenumber. */
  private def churnersFedexFlow(): Seq[Array[Row]] = {
    val bank = ExplainFrame(graft.util.D.t(spark, sf, "lineitem"), "bank")
    // cell: where(Customer_Age > 45) + explain(attributes=[…], show_scores)
    val filterResults = bank.where(col("l_quantity") > 25)
    val ex1 = filterResults.explain(
      attributes = Seq("l_discount", "l_returnflag"), useSampling = false).collect()
    // cells: loyal / churn split on the attrition flag
    val loyal = bank.filter(col("l_returnflag") === "N")
    val churn = bank.filter(col("l_returnflag") =!= "N")
    // cell: x = loyal.Total_Count_Change.mean(); churn[col > x].explain(top_k=3)
    val x = loyal.df.agg(avg(col("l_discount"))).head().getDouble(0)
    val filter2 = churn.filter(col("l_discount") > x)
    val ex2 = filter2.explain(topK = 3, useSampling = false).collect()
    // cell: groupby('Marital_Status').agg({Credit_Limit: [mean, max],
    //       Credit_Used: mean}).explain(top_k=2, use_sampling=False)
    val gb1 = churn.groupBy("l_linestatus").agg(
      "l_extendedprice" -> "mean", "l_extendedprice" -> "max", "l_tax" -> "mean")
    val ex3 = gb1.explain(topK = 2, useSampling = false).collect()
    // cell: groupby([3 cats])['Credit_Used'].mean().explain(top_k=5)
    val gb2 = churn.groupBy("l_linestatus", "l_returnflag", "l_linenumber")
      .mean("l_tax")
    val ex4 = gb2.explain(topK = 5, useSampling = false).collect()
    // cells: the custom total_more_then_20 reduce — count of values over
    // a threshold, expressed as a derived 0/1 column + sum (same math,
    // scan-local instead of a driver-side reduce)
    val churn2 = churn.select(col("*"),
      (col("l_discount") > 0.05).cast("long").as("over_thresh"))
    val gb3 = churn2.groupBy("l_linenumber", "l_returnflag", "l_linestatus")
      .agg("l_tax" -> "mean", "over_thresh" -> "sum")
    val gb3rows = gb3.df.collect()
    val ex5 = gb3.explain(useSampling = false).collect()
    Seq(ex1, ex2, ex3, ex4, gb3rows, ex5)
  }

  test("Bank-Churners fedex notebook flow: attribute-pinned filter explain, mean-threshold cell, multi-agg and 3-column groupbys, custom aggregation") {
    val out = churnersFedexFlow()
    val Seq(ex1, ex2, ex3, ex4, gb3rows, ex5) = out
    // attribute-pinned filter explain: only the passed attributes appear
    assert(ex1.nonEmpty)
    val attrSet = ex1.map(r => r.getString(r.fieldIndex("attribute"))).toSet
    assert(attrSet.subsetOf(Set("l_discount", "l_returnflag")))
    val kls1 = ex1.map(r => r.getDouble(r.fieldIndex("kl_score"))).toSeq
    assert(kls1 === kls1.sorted(Ordering[Double].reverse))
    // the mean-threshold filter cell: ranked, finite, ≤3
    assert(ex2.nonEmpty && ex2.length <= 3)
    val kls2 = ex2.map(r => r.getDouble(r.fieldIndex("kl_score"))).toSeq
    assert(kls2.forall(k => !k.isNaN && !k.isInfinite))
    assert(kls2 === kls2.sorted(Ordering[Double].reverse))
    // multi-agg groupby: measures come from the dict-agg cell's outputs
    assert(ex3.nonEmpty && ex3.length <= 2)
    val measures3 = ex3.map(r => r.getString(r.fieldIndex("measure"))).toSet
    assert(measures3.subsetOf(Set("l_extendedprice_mean", "l_extendedprice_max",
      "l_tax_mean", "row_count")), s"unexpected measures $measures3")
    // three-column groupby: zdev ranked desc over ≤5 rows
    assert(ex4.nonEmpty && ex4.length <= 5)
    val zs4 = ex4.map(r => r.getDouble(r.fieldIndex("zdev"))).toSeq
    assert(zs4 === zs4.sorted(Ordering[Double].reverse))
    // the custom aggregation matches the notebook's reduce exactly:
    // over_thresh_sum = count of values over the threshold per group
    val truth = graft.util.D.t(spark, sf, "lineitem")
      .filter(col("l_returnflag") =!= "N")
      .groupBy("l_linenumber", "l_returnflag", "l_linestatus")
      .agg(sum((col("l_discount") > 0.05).cast("long")).as("want"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    gb3rows.foreach { r =>
      val k = (r.getInt(0), r.getString(1), r.getString(2))
      // the agg surface emits sums through the decimal→double path
      assert(r.getDouble(r.fieldIndex("over_thresh_sum")) === truth(k).toDouble, s"group $k")
    }
    assert(ex5.nonEmpty)
    // whole-flow determinism
    val again = churnersFedexFlow()
    out.zip(again).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"churners fedex flow cell $i diverged between runs")
    }
  }

  /** The Houses demo (Examples/Notebooks/Fedex Explainer Examples/
    * Houses Dataset Demo.ipynb): load with a COLUMN SUBSET →
    * SalePrice.describe() → price filter explain(top_k=6) →
    * groupby(YrSold).mean() [all numerics] explain(top_k=6) →
    * groupby(YrSold)[PoolArea].mean().explain(outlier, dir='high',
    * target=2006) → GarageCars.value_counts(). houses := lineitem;
    * SalePrice := l_extendedprice; YrSold := year(l_shipdate);
    * PoolArea := l_discount; GarageCars := l_linenumber. */
  private def housesFlow(): Seq[Array[Row]] = {
    // load cell: the notebook immediately projects a column subset (and
    // pool_area keeps PoolArea's square-feet magnitude — the σ=0
    // tiny-mean case is pinned separately below)
    val houses = ExplainFrame(graft.util.D.t(spark, sf, "lineitem")
      .withColumn("yr_sold", year(col("l_shipdate")).cast("long"))
      .withColumn("pool_area", (col("l_discount") * 1000).cast("double")), "houses")
      .select(col("yr_sold"), col("l_extendedprice"), col("l_quantity"),
        col("pool_area"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_linenumber"))
    // cell: houses['SalePrice'].describe()
    val desc = houses.describeStats(Seq("l_extendedprice")).collect()
    // cell: expensive = houses[SalePrice > 214000]; explain(top_k=6)
    val expensive = houses.filter(col("l_extendedprice") > 40000)
    val ex1 = expensive.explain(topK = 6, useSampling = false).collect()
    // cell: houses.groupby('YrSold').mean().explain(top_k=6) — pandas
    // .mean() over every numeric column = the explicit all-numerics agg
    val gbYear = houses.groupBy("yr_sold").agg(
      "l_extendedprice" -> "mean", "l_quantity" -> "mean",
      "pool_area" -> "mean", "l_tax" -> "mean")
    val ex2 = gbYear.explain(topK = 6, useSampling = false).collect()
    // cell: groupby('YrSold')['PoolArea'].mean().explain(outlier, high, 2006)
    val poolGb = houses.groupBy("yr_sold").mean("pool_area")
    val hiYear = poolGb.df.collect().map(_.getLong(0)).max.toString
    val ex3 = poolGb.explain(explainer = "outlier", dir = "high",
      target = hiYear).collect()
    // cell: houses['GarageCars'].value_counts()
    val vc = houses.valueCounts("l_linenumber").collect()
    Seq(desc, ex1, ex2, ex3, vc)
  }

  test("Houses notebook flow: column-subset load, describe, wide filter explain, all-numerics groupby, outlier-high on a derived year") {
    val out = housesFlow()
    val Seq(desc, ex1, ex2, ex3, vc) = out
    // describe(): the pandas core stats for the price column, count
    // agreeing with a direct truth
    assert(desc.nonEmpty)
    val li = graft.util.D.t(spark, sf, "lineitem")
    val wantN = li.filter(col("l_extendedprice").isNotNull).count()
    val priceRow = desc.find(_.getString(0) == "l_extendedprice").get
    assert(priceRow.getLong(priceRow.fieldIndex("n")) === wantN)
    // filter explain at top_k=6: ranked desc, finite, only subset columns
    assert(ex1.nonEmpty && ex1.length <= 6)
    val kls = ex1.map(r => r.getDouble(r.fieldIndex("kl_score"))).toSeq
    assert(kls.forall(k => !k.isNaN && !k.isInfinite))
    assert(kls === kls.sorted(Ordering[Double].reverse))
    // all-numerics groupby explain: measures confined to the agg outputs
    assert(ex2.nonEmpty && ex2.length <= 6)
    val measures = ex2.map(r => r.getString(r.fieldIndex("measure"))).toSet
    assert(measures.subsetOf(Set("l_extendedprice_mean", "l_quantity_mean",
      "pool_area_mean", "l_tax_mean", "row_count")), s"unexpected measures $measures")
    // outlier-high on the derived year dimension: influence desc, finite
    assert(ex3.nonEmpty)
    val infl = ex3.map(r => r.getDouble(r.fieldIndex("influence"))).toSeq
    assert(infl.forall(x => !x.isNaN && !x.isInfinite))
    assert(infl === infl.sorted(Ordering[Double].reverse))
    // value_counts: counts desc and equal to a direct truth
    val truth = li.groupBy("l_linenumber").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    vc.foreach(r => assert(truth(r.getInt(0)) === r.getLong(1)))
    val cnts = vc.map(_.getLong(1)).toSeq
    assert(cnts === cnts.sorted(Ordering[Long].reverse))
    // whole-flow determinism
    val again = housesFlow()
    out.zip(again).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
        s"houses flow cell $i diverged between runs")
    }
  }
}
