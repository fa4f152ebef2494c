package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only soak harness (`runMain graft.Soak [replicas] [sfDir]`): scales
  * the documents corpus ~`replicas`× past the bench SF (ids shifted, a
  * per-replica marker token prepended so replicas are near- but not
  * exact-duplicates) and times the iterative / stage-materializing dedup
  * paths — MinHash-LSH pair generation, connected-components resolution,
  * and the incremental batch-vs-corpus screen — to confirm they hold
  * their shape when the working set exceeds executor cache (VERDICT r3
  * stretch item). Writes only under /tmp; never part of the driver
  * contract.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.length > 0) args(0).toInt else 10
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // "chain" runs ONLY the minhash -> components -> leakage-split
    // headline chain (the r13 100x soak target); default runs the full
    // rotation (the 30x r10-r12 suite)
    val mode = if (args.length > 2) args(2) else "full"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val baseN = base.count()
    // replica k: ids shifted by k*10M, text prefixed with a replica marker
    // so copies are near-duplicates (high Jaccard), not byte-identical
    val corpusPath = s"/tmp/graft_soak_docs_r$replicas"
    val corpus = (0 until replicas).map { k =>
      base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        concat_ws(" ", lit(s"r$k"), col("text")).as("text"))
    }.reduce(_.unionByName(_))
    corpus.write.mode("overwrite").parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    println(s"[soak] corpus: ${docs.count()} docs (${replicas}x of $baseN)")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[soak] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    if (mode == "r14" || mode == "r14knn") {
      // the r14/r15 heavy family at replica scale: weighted-Jaccard
      // near-dup over the replicated text corpus, then the full kNN
      // index LIFECYCLE over a replicated embedding corpus — descent
      // build, merge-in (q180), beam serving (q183), delete repair
      // (q187). Each replica's vectors are shifted by a per-replica
      // constant so replicas form distinct neighborhoods (copies with
      // identical coordinates would make every heap a tie-break).
      // sliced: the synthetic corpus draws every doc from one ~50-word
      // vocabulary, so under UNIGRAM multiset Jaccard nearly every doc
      // pair is >= 0.5 similar — the true pair set is quadratic BY
      // CORPUS CONSTRUCTION (measured: 10k docs -> 5.0M verified
      // pairs, 50k -> 114M), which no banding can make subquadratic.
      // The slice keeps the soak row meaningful: the operator's cost
      // is linear in docs + emitted pairs, and real corpora's
      // background similarity is nowhere near this.
      if (mode == "r14") {
        val wjDocs = docs.filter(col("doc_id") % 5 === 0)
        val wjPairs = timed(
          s"weighted Jaccard join (q178 shape, ${wjDocs.count()} docs)") {
          operators.Dedup.weightedJaccardJoin(wjDocs, "text", "doc_id",
            cap = 5, numHashes = 8, bands = 4, jaccardThreshold = 0.5)
            .count()
        }
        println(s"[soak]   -> $wjPairs weighted-Jaccard pairs")
      }
      val embBase = Tables.load(spark, sfDir, "embeddings")
      val embPath = s"/tmp/graft_soak_emb_r$replicas"
      (0 until replicas).map { k =>
        embBase.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          transform(col("embedding"),
            x => x + lit((k % 13) * 0.07f)).as("embedding"))
      }.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(embPath)
      val emb = spark.read.parquet(embPath)
      println(s"[soak] embedding corpus: ${emb.count()} vectors")
      val old = emb.filter(col("vec_id") % 10 =!= 0)
      val batchE = emb.filter(col("vec_id") % 10 === 0)
      val graph = timed("nnDescent backbone (k=4, 2 rounds)") {
        val g = operators.Ann.nnDescentPortable(old, "embedding",
          "vec_id", 4, 2, 1000).localCheckpoint(false)
        println(s"[soak]   -> ${g.count()} backbone edges")
        g
      }
      val merged = timed("knnGraphMerge (q180: absorb the 10% batch)") {
        val m = operators.Ann.knnGraphMerge(graph, old, batchE,
          "embedding", "vec_id", 4, 1, 1000).localCheckpoint(false)
        println(s"[soak]   -> ${m.count()} merged edges")
        m
      }
      timed("beamSearchPortable (q183: serve 1% as queries, ef=8)") {
        val queries = emb.filter(col("vec_id") % 100 === 1)
        val served = operators.Ann.beamSearchPortable(merged, emb,
          queries, "embedding", "vec_id", 4, 8, 2).count()
        println(s"[soak]   -> $served served rows")
      }
      timed("knnGraphDelete (q187: delete ~11% of the merged index)") {
        val delIds = emb.filter(col("vec_id") % 9 === 2)
          .select(col("vec_id"))
        val repaired = operators.Ann.knnGraphDelete(merged, emb, delIds,
          "embedding", "vec_id", 4, 1000)
        println(s"[soak]   -> ${repaired.count()} repaired edges")
      }
      spark.stop()
      return
    }


    if (mode == "r15tok") {
      // the q195 tokenizer trainer at replica scale: the substring
      // vocabulary count is the corpus-proportional stage (the DP runs
      // over word TYPES, which replication barely grows)
      timed(s"wordpieceVocab + segment (q195 shape, ${docs.count()} " +
          "docs)") {
        val vocab = operators.TextAnalysis.wordpieceVocab(docs, "text")
          .localCheckpoint(false)
        val seg = operators.TextAnalysis.wordpieceSegment(docs, "text",
          vocab)
        val n = seg.count()
        val mean = seg.agg(avg(col("n_pieces"))).head.getDouble(0)
        println(f"[soak]   -> $n word types, mean $mean%.2f pieces")
      }
      spark.stop()
      return
    }

    if (mode == "drift") {
      // the q206/q207 KS machinery at replica scale, with the value
      // space made HIGH-CARDINALITY on purpose (a near-unique value
      // per row): per-value counting collapses nothing, so the
      // prefixSums two-phase scan runs at corpus row scale — the
      // honest stress for the distributed ECDF. The B side is shifted
      // +37 so the statistic is small-but-nonzero (a real monitor's
      // regime), not a degenerate 0 or 1.
      val vals = docs.select(col("doc_id"),
        (length(col("text")).cast("long") * 10000000L +
          pmod(col("doc_id"), lit(10000000L))).as("v"))
        .localCheckpoint(false)
      val a = vals.filter(col("doc_id") % 2 === 0)
      val b = vals.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), (col("v") + 37L).as("v"))
      val n = vals.count()
      timed(s"exact two-sample KS ($n rows, near-unique values)") {
        val r = operators.Stats.ksStatistic(a, b, "v").head()
        println(s"[soak]   -> nA=${r.getLong(0)} nB=${r.getLong(1)} " +
          f"d_num=${r.getLong(3)} ks=${r.getDouble(4)}%.6f")
      }
      timed("per-group KS (999 synthetic groups, same rows)") {
        // 999 (odd) so doc parity VARIES inside each group — an even
        // modulus would pin parity per group and drop every group as
        // one-sided
        val grouped = vals.withColumn("grp", pmod(col("doc_id"), lit(999L)))
        val rows = operators.Stats.ksStatisticByGroup(grouped, "grp",
          col("doc_id") % 2 === 0, "v").count()
        println(s"[soak]   -> $rows group rows")
      }
      spark.stop()
      return
    }

    if (mode == "perceptron") {
      // the vectorized multiclass trainer at replica scale: K=4
      // class-salted corpora (the q199 convention — private md5
      // vocabularies per class) over the replicated docs; the claim
      // under test is epochs-not-K·epochs driver round-trips with the
      // class axis in the plan
      val classes = Seq("c0", "c1", "c2", "c3")
      val salted = classes.zipWithIndex.map { case (c, i) =>
        docs.select((col("doc_id") * 4 + i).as("doc_id"),
          concat_ws(" ", array_join(transform(
            split(trim(lower(col("text"))), "\\s+"),
            w => substring(md5(concat(w, lit(s":$c"))), 1, 8)), " "))
            .as("text"),
          lit(c).as("label"))
      }.reduce(_.unionByName(_)).localCheckpoint(false)
      val n = salted.count()
      timed(s"perceptronTrainMulti (K=4, 2 epochs, $n docs)") {
        val w = operators.Classifier.perceptronTrainMulti(
          salted, "text", "doc_id", "label", nBuckets = 2048,
          epochs = 2)
        println(s"[soak]   -> ${w.count()} weight rows")
      }
      spark.stop()
      return
    }

    if (mode == "exactsubstr") {
      // suffix-array EXACTSUBSTR (q222) at replica scale: replicas share
      // everything past the marker token, so the duplicated-span mass
      // grows linearly with replicas while every pipeline frame stays
      // corpus-token-scale — the claim under test is that no doubling
      // round (or the adjacency/removal tail) goes superlinear
      val n = docs.count()
      timed(s"exactSubstrDedup (minSpan 50, base 16, 3 doublings, $n docs)") {
        val out = operators.SuffixArray.exactSubstrDedup(
          docs, "text", "doc_id", minSpan = 50, rounds = 3, baseSpan = 16)
        val agg = out.agg(count(lit(1)).as("docs"),
          sum(col("n_removed_starts")).as("starts"),
          sum(col("n_dropped")).as("dropped")).head
        println(s"[soak]   -> ${agg.getLong(0)} docs, " +
          s"${agg.getLong(1)} removed starts, " +
          s"${agg.getLong(2)} tokens dropped")
      }
      spark.stop()
      return
    }

    if (mode == "fertility") {
      // q219's shape at replica scale (SCALE §9y): the unigram model
      // and the word-type Viterbi DP are VOCAB-scale (replicas add only
      // the r<k> marker types), the occurrence-weighted fertility
      // report is corpus-scale — the claim is wall grows with corpus
      // tokens, never vocab × corpus
      val p = SketchParams.q217
      val model = timed("unigramLmTrain (base corpus)") {
        operators.TextAnalysis.unigramLmTrain(base, "text", p.iters,
          p.quant, p.maxPiece, p.maxWord, p.minFreq)
          .localCheckpoint(true)
      }
      val langd = docs.withColumn("lang",
        (col("doc_id") % 5).cast("string"))
      timed(s"byte-fallback fertility (${replicas}x corpus)") {
        val seg = operators.TextAnalysis.byteFallbackSegment(
          operators.TextAnalysis.unigramLmSegment(langd, "text", model,
            p.maxPiece, p.maxWord))
        val out = operators.TextAnalysis.tokenizerFertilityFallback(
          langd, "text", "lang", seg, p.quant)
        val agg = out.agg(count(lit(1)).as("langs"),
          sum(col("n_fallback_occ")).as("fallback")).head
        println(s"[soak]   -> ${agg.getLong(0)} groups, " +
          s"${agg.getLong(1)} fallback occurrences")
      }
      spark.stop()
      return
    }

    if (mode == "saprobe") {
      // the r19 incremental contract: probe cost ∝ BATCH tokens at a
      // FROZEN corpus. The index is built+persisted once over the
      // unreplicated base corpus; replicas scale only the probe batch
      // (truncated twins, ids disjoint per replica), so a superlinear
      // batch sweep or any corpus-rescan would show directly.
      val ix = timed(s"buildSubstrIndex + save/load ($baseN fixed docs)") {
        val built = operators.SuffixArray.buildSubstrIndex(
          base, "text", "doc_id", minSpan = 50, baseSpan = 16)
        val root = s"/tmp/graft_soak_saix/ix"
        operators.SuffixArray.saveSubstrIndex(built, root)
        operators.SuffixArray.loadSubstrIndex(spark, root)
      }
      Seq(1, math.max(1, replicas / 3), replicas).distinct.foreach { k =>
        val batch = (0 until k).map { j =>
          base.select(
            (col("doc_id") + lit(900000000L + j * 10000000L)).as("doc_id"),
            regexp_replace(col("text"), " [^ ]+$", "").as("text"))
        }.reduce(_.unionByName(_)).localCheckpoint(true)
        val nb = batch.count()
        timed(s"exactSubstrProbe (${k}x batch, $nb docs, frozen corpus)") {
          val agg = operators.SuffixArray
            .exactSubstrProbe(ix, batch, "text", "doc_id")
            .agg(count(lit(1)).as("docs"),
              sum(col("n_removed_starts")).as("starts"),
              sum(col("n_dropped")).as("dropped")).head
          println(s"[soak]   -> ${agg.getLong(0)} docs, " +
            s"${agg.getLong(1)} contaminated starts, " +
            s"${agg.getLong(2)} tokens dropped")
        }
      }
      spark.stop()
      return
    }

    if (mode == "decontam") {
      // q229's cross-side shape at replica scale: bench = truncated
      // twins of every 3rd replica-0 doc; every replica of a benched
      // doc shares its >= 50-token runs, so the contaminated-span load
      // grows with the corpus while the SA build carries corpus+bench
      val bench = docs
        .filter(col("doc_id") < 10000000L && col("doc_id") % 3 === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          regexp_replace(col("text"), " [^ ]+$", "").as("text"))
      val n = docs.count(); val nb = bench.count()
      timed(s"exactSubstrContamination (minSpan 50, base 32, " +
          s"2 doublings, $n corpus + $nb bench docs)") {
        val out = operators.SuffixArray.exactSubstrContamination(
          docs, bench, "text", "doc_id", minSpan = 50, rounds = 2,
          baseSpan = 32)
        val agg = out.agg(count(lit(1)).as("docs"),
          sum(col("n_removed_starts")).as("starts"),
          sum(col("n_dropped")).as("dropped")).head
        println(s"[soak]   -> ${agg.getLong(0)} corpus docs, " +
          s"${agg.getLong(1)} contaminated starts, " +
          s"${agg.getLong(2)} tokens dropped")
      }
      spark.stop()
      return
    }

    if (mode == "absorb") {
      // the r20 index-maintenance lifecycle at replica scale: ONE
      // frozen counted index over the replicated corpus, then absorb
      // batches of 1x and 4x size against it — absorb wall must track
      // the BATCH (the corpus never re-ranks; its stored maps are only
      // scanned map-side by the level joins), and a second batch
      // copying the first batch's spans must be rejected by the grown
      // index (the streaming loop's observable).
      val ixRoot = java.nio.file.Files
        .createTempDirectory("graft-soak-absorb").resolve("ix").toString
      val ix = timed(s"buildSubstrIndex (${replicas}x corpus, base 16)") {
        val built = operators.SuffixArray.buildSubstrIndex(
          docs, "text", "doc_id", minSpan = 50, baseSpan = 16)
        operators.SuffixArray.saveSubstrIndex(built, ixRoot)
        operators.SuffixArray.loadSubstrIndex(spark, ixRoot)
      }
      val b1 = base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 950000000L).as("doc_id"),
          regexp_replace(col("text"), " [^ ]+$", "").as("text"))
        .localCheckpoint(true)
      // 4x batch: distinct content per slice (novel windows scale with
      // the batch — the absorb's worst case)
      val b4 = (0 until 4).map { k =>
        b1.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          concat_ws(" ", lit(s"b$k"), col("text")).as("text"))
      }.reduce(_.unionByName(_)).localCheckpoint(true)
      val n1 = b1.count(); val n4 = b4.count()
      def absorbTimed(tag: String, b: org.apache.spark.sql.DataFrame)
          : Unit =
        timed(s"absorb + persist ($tag)") {
          val root2 = java.nio.file.Files
            .createTempDirectory(s"graft-soak-absorb-b")
            .resolve("ix").toString
          val grown = operators.SuffixArray.absorbSubstrIndex(
            ix, b, "text", "doc_id")
          operators.SuffixArray.saveSubstrIndex(grown, root2)
        }
      // untimed warm-up: the first absorb pays per-plan codegen JIT
      // (measured 1.5x on the first timing otherwise)
      absorbTimed(s"warm-up, $n1 docs", b1)
      absorbTimed(s"batch 1x, $n1 docs", b1)
      absorbTimed(s"batch 4x, $n4 docs", b4)
      val grown = operators.SuffixArray.absorbSubstrIndex(
        ix, b1, "text", "doc_id")
      val b2 = b1.select((col("doc_id") + 5000000L).as("doc_id"),
        regexp_replace(col("text"), " [^ ]+$", "").as("text"))
      timed("probe-after-absorb (batch-2 copies of batch-1 spans)") {
        val out = operators.SuffixArray.exactSubstrProbe(
          grown, b2, "text", "doc_id")
        val agg = out.agg(count(lit(1)).as("d"),
          sum(col("n_removed_starts")).as("s")).head
        println(s"[soak]   -> ${agg.getLong(0)} batch-2 docs, " +
          s"${agg.getLong(1)} rejected duplicate starts")
      }
      spark.stop()
      return
    }

    if (mode == "spectrum") {
      println(s"[soak] docs partitions: ${docs.rdd.getNumPartitions}")
      timed("buildSignatures over a MATERIALIZED checkpoint of docs") {
        val cp = docs.localCheckpoint(false)
        cp.count()
        operators.SuffixArray.buildSignatures(cp,
          "text", "doc_id", 50, rounds = 1, baseSpan = 8, needSa = false)
          .sig.count()
      }
      val st = timed("buildSignatures over docs (flat, base 8)") {
        val s0 = operators.SuffixArray.buildSignatures(docs, "text",
          "doc_id", 50, rounds = 1, baseSpan = 8, needSa = false)
        println(s"[soak]   -> ${s0.sig.count()} sig rows")
        s0
      }
      val g = timed("sig groupBy count") {
        val g0 = st.sig.groupBy(st.sigCols.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") >= 2).localCheckpoint(false)
        println(s"[soak]   -> ${g0.count()} dup groups")
        g0
      }
      timed("bucket agg") {
        g.select((length(bin(col("__c"))) - 1).cast("int")
            .as("freq_bucket"), col("__c"))
          .groupBy(col("freq_bucket"))
          .agg(count(lit(1)).as("n_groups"),
            sum(col("__c")).as("n_dup_suffixes")).count()
      }
      timed(s"duplicationSpectrum end-to-end") {
        operators.SuffixArray.duplicationSpectrum(
          docs, "text", "doc_id", minSpan = 50, baseSpan = 8).count()
      }
      spark.stop()
      return
    }

    if (mode == "memorization" || mode == "memreport") {
      // q233's spectrum + q232's report at replica scale: every replica
      // shares its base doc's interior >= 50-token runs (the replica
      // marker shifts positions by one, which exact spans don't mind),
      // so signature-group frequencies track the replica count and the
      // spectrum's heavy bucket moves with log2(replicas) — ground
      // truth by construction. The bench side stays FIXED so the
      // report's growth isolates the corpus-side count aggregation.
      if (mode != "memreport") timed(s"duplicationSpectrum (minSpan 50, " +
          s"base 8, ${replicas}x corpus)") {
        val sp = operators.SuffixArray.duplicationSpectrum(
            docs, "text", "doc_id", minSpan = 50, baseSpan = 8)
          .orderBy(col("freq_bucket")).collect()
        sp.foreach(r => println(s"[soak]   -> bucket ${r.getInt(0)} " +
          s"(>=${r.getLong(1)}): ${r.getLong(2)} groups, " +
          s"${r.getLong(3)} occurrences"))
      }
      val bench = base
        .filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          regexp_replace(col("text"), " [^ ]+$", "").as("text"))
      val nb = bench.count()
      timed(s"memorizationReport ($nb fixed bench docs, " +
          s"${replicas}x corpus)") {
        val agg = operators.SuffixArray.memorizationReport(
            docs, bench, "text", "doc_id", minSpan = 50, baseSpan = 8)
          .agg(count(lit(1)).as("d"),
            sum(col("n_memorized_starts")).as("s"),
            max(col("max_corpus_freq")).as("m"),
            sum(col("covered_tokens")).as("c")).head
        println(s"[soak]   -> ${agg.getLong(0)} bench docs, " +
          s"${agg.getLong(1)} memorized starts, " +
          s"max corpus freq ${agg.getLong(2)}, " +
          s"${agg.getLong(3)} covered tokens")
      }
      spark.stop()
      return
    }

    if (mode == "memprofile") {
      // dev-only stage breakdown of memorizationReport's plan
      val bench = base
        .filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          regexp_replace(col("text"), " [^ ]+$", "").as("text"))
      val union = docs
        .select(col("doc_id"), col("text"), lit(false).as("__bench"))
        .unionByName(bench.select(col("doc_id"), col("text"),
          lit(true).as("__bench")))
        .localCheckpoint(false)
      timed("collision check") {
        union.filter(col("__bench")).select(col("doc_id"))
          .join(union.filter(!col("__bench")).select(col("doc_id")),
            Seq("doc_id"), "left_semi").limit(1).count()
      }
      for (bs <- Seq(32, 16, 8)) {
        val bl = 31 - Integer.numberOfLeadingZeros(bs)
        val rr = math.max(1,
          operators.SuffixArray.decompose(50, bl).map(_._1).max - bl)
        timed(s"buildSignatures (sig-only, baseSpan $bs, $rr doublings)") {
          operators.SuffixArray.buildSignatures(union, "text",
            "doc_id", 50, rounds = rr, baseSpan = bs, needSa = false)
            .sig.count()
        }
      }
      val st = timed("buildSignatures (sig-only)") {
        val s0 = operators.SuffixArray.buildSignatures(union, "text",
          "doc_id", 50, rounds = 1, baseSpan = 32, needSa = false)
        s0.sig.count()
        s0
      }
      val benchIds = union.filter(col("__bench"))
        .select(col("doc_id"))
      val corpusCnt = timed("corpusCnt groupBy") {
        val c = st.sig.join(benchIds, Seq("doc_id"), "left_anti")
          .groupBy(st.sigCols.map(col): _*)
          .agg(count(lit(1)).as("__c")).localCheckpoint(false)
        println(s"[soak]   -> ${c.count()} groups")
        c
      }
      timed("hits join + stats") {
        val hits = st.sig.join(benchIds, Seq("doc_id"), "left_semi")
          .join(corpusCnt, st.sigCols)
          .select(col("doc_id"), col("pos"), col("__c"))
        println(s"[soak]   -> ${hits.count()} hits")
      }
      spark.stop()
      return
    }

    if (mode == "simhash") {
      // the q31 pigeonhole banding at replica scale (SCALE §9s follow-up):
      // a 150-family slice (the q31 corpusMax pattern) whose families are
      // near-identical replicas, so GROUND TRUTH is quadratic in replicas
      // — the claim under test is that the banded join's candidate mass
      // tracks that family ground truth (never the corpus square) and
      // recall stays exact (pigeonhole)
      val p = SketchParams.q31
      val sliced = docs.filter(col("doc_id") % 10000000L < 150)
        .filter(col("text").isNotNull && col("text") =!= "")
      val fp = operators.Dedup
        .simhashPortable(sliced, "text", "doc_id").localCheckpoint(true)
      val nf = fp.count()
      val banded = operators.Dedup
        .pigeonholeBands(fp, "simhash", "doc_id", p.bandLayout)
        .localCheckpoint(true)
      val candidates = timed(s"candidate mass ($nf fingerprints)") {
        val a = banded.select(col("band"), col("bv"), col("doc_id").as("id_a"))
        val b = banded.select(col("band"), col("bv"), col("doc_id").as("id_b"))
        a.join(b, Seq("band", "bv")).filter(col("id_a") < col("id_b")).count()
      }
      val pairs = timed("pigeonholeHammingPairs (verify + distinct)") {
        operators.Dedup.pigeonholeHammingPairs(
          fp, "simhash", "doc_id", p.bandLayout, p.maxHamming)
          .localCheckpoint(true)
      }
      val nPairs = pairs.count()
      // exact ground truth within families (replicas of one base doc):
      // family all-pairs + bit_count — cheap because families are tiny
      val fam = fp.select((col("doc_id") % 10000000L).as("__f"),
        col("doc_id"), col("simhash"))
      val truth = fam.as("x").join(fam.as("y"),
          col("x.__f") === col("y.__f") &&
            col("x.doc_id") < col("y.doc_id"))
        .filter(bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          <= p.maxHamming)
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      val nTruth = truth.count()
      val missed = truth.join(pairs, Seq("id_a", "id_b"), "left_anti").count()
      println(s"[soak]   -> candidates $candidates, verified pairs " +
        s"$nPairs, in-family truth $nTruth, in-family missed $missed " +
        "(pigeonhole => 0)")
      spark.stop()
      return
    }

    if (mode == "datacard") {
      // the q218 per-source data card at replica scale, over the
      // DIVERSIFIED-vocabulary corpus (§9o: families of true
      // near-dups in a sea of mutually-dissimilar docs — the
      // realistic regime for the card's pair sketch; the flat
      // synthetic vocabulary would make the pair set quadratic by
      // construction). Sources synthesized as doc_id % 20.
      val fam = (col("doc_id") % 10000000L).cast("string")
      val div = docs.select(col("doc_id"),
          concat_ws(" ", transform(split(trim(lower(col("text"))), "\\s+"),
            w => substring(md5(concat(w, lit(":"), fam)), 1, 8)))
            .as("text"),
          (col("doc_id") % 20).cast("string").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .localCheckpoint(false)
      val n = div.count()
      println(s"[soak] datacard corpus: $n docs, 20 sources")
      val junk = div.select(
        (col("doc_id") + lit(1000000000L)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => substring(md5(concat(w, lit(":junk"))), 1, 8)))
          .as("text"))
      val train = div.select(col("doc_id"), col("text"),
          lit(1L).as("label"))
        .unionByName(junk.select(col("doc_id"), col("text"),
          lit(-1L).as("label")))
      val weights = timed("perceptron train (2 epochs, real+junk)") {
        val w = operators.Classifier.perceptronTrain(
          train.filter(col("doc_id") % 5 =!= 0), "text", "doc_id",
          "label", 2048, 2).localCheckpoint(true)
        println(s"[soak]   -> ${w.count()} weight rows"); w
      }
      val pairs = timed("minhash pair sketch (full corpus)") {
        val p = operators.Dedup.minhashLshPortable(div, "text",
          "doc_id", 3, 8, 4, 0.5).localCheckpoint(true)
        println(s"[soak]   -> ${p.count()} pairs"); p
      }
      timed("card assembly (flags + CC + per-source KS + plan)") {
        val scored = operators.Classifier.perceptronScore(div, weights,
          "text", "doc_id", 2048)
        val blocked = operators.TextAnalysis.blocklistGate(div, "text",
            "doc_id", Seq("zzznever"))
          .select(col("doc_id"), col("blocked"))
        val dup = pairs.select(col("id_b").as("doc_id")).distinct()
          .withColumn("__dup", lit(true))
        val flags = div
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .join(scored.select(col("doc_id"), col("predicted")),
            Seq("doc_id"))
          .join(blocked, Seq("doc_id"))
          .join(dup, Seq("doc_id"), "left")
          .withColumn("kept", col("predicted") && !col("blocked") &&
            !coalesce(col("__dup"), lit(false)))
        val funnel = flags.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("kept"), col("n_tokens")).otherwise(0L))
              .as("kept_tokens"))
        val assign = operators.Components.dedupAssignments(
          div.select(col("doc_id")), "doc_id", pairs, "id_a", "id_b")
        val dd = assign
          .select(col("id").as("doc_id"),
            (col("id") =!= col("keep_id")).as("is_dup"))
          .join(div.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy(col("source"))
          .agg(sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"))
        val drift = operators.Stats.ksStatisticByGroup(div, "source",
            col("doc_id") % 2 === 0, "n_chars")
          .select(col("source"), col("ks"))
        val plan = operators.Sampling.mixturePlan(
          funnel.select(col("source"), col("kept_tokens")), "source",
          "kept_tokens",
          (0 until 20).map(i => i.toString -> 30000L).toMap,
          1000000L)
        val rows = funnel.join(dd, Seq("source"))
          .join(drift, Seq("source"), "left")
          .join(broadcast(plan.select(col("source"),
            col("target_tokens"))), Seq("source"))
          .count()
        println(s"[soak]   -> $rows card rows")
      }
      spark.stop()
      return
    }

    if (mode == "divvocab") {
      // diversified-vocabulary near-dup soak (the §9m caveat closed):
      // the flat synthetic corpus draws every doc from one ~50-word
      // vocabulary, so unigram-Jaccard ground truth is quadratic BY
      // CONSTRUCTION and the §9m weighted-Jaccard row had to run on a
      // 1-in-5 slice. This fixture is DERIVED from the same table with
      // one PRIVATE vocabulary per base doc: token w of base doc d ->
      // substr(md5(w || ':' || d), 1, 8), identical across d's
      // replicas. Families of true near-duplicates (the replicas) sit
      // in a sea of mutually-dissimilar docs — total vocab ∝ corpus,
      // background similarity ~0, true pairs ∝ families·replicas² —
      // the realistic regime, so the ops run UNSLICED.
      val fam = (col("doc_id") % 10000000L).cast("string")
      val div = docs.select(col("doc_id"),
        array_join(transform(split(trim(lower(col("text"))), "\\s+"),
          w => substring(md5(concat(w, lit(":"), fam)), 1, 8)), " ")
          .as("text"))
        .localCheckpoint(false)
      val vocabN = div
        .select(explode(split(col("text"), " ")).as("w"))
        .distinct().count()
      println(s"[soak] diversified corpus: ${div.count()} docs, " +
        s"$vocabN distinct tokens")
      val wjPairs = timed("weighted Jaccard join UNSLICED (q178 shape)") {
        operators.Dedup.weightedJaccardJoin(div, "text", "doc_id",
          cap = 5, numHashes = 8, bands = 4, jaccardThreshold = 0.5)
          .count()
      }
      println(s"[soak]   -> $wjPairs weighted-Jaccard pairs")
      val mhPairs = timed("minhashLsh UNSLICED (3-gram)") {
        operators.Dedup.minhashLsh(div, "text", "doc_id",
          ngram = 3, numHashes = 16, bands = 4, jaccardThreshold = 0.5)
          .count()
      }
      println(s"[soak]   -> $mhPairs minhash pairs")
      spark.stop()
      return
    }

    if (mode == "dedupix") {
      // the r16 dedup-index LIFECYCLE at replica scale: prepare the
      // 90% history once, then stream the 10% in three waves — each
      // wave screens against the live index, and its SURVIVORS are
      // absorbed (updateCorpusIndex) so the next wave probes them.
      // Per-wave cost must stay wave-proportional; the absorb is
      // batch-local by construction. Fixture: divvocab-derived (see
      // that mode) so near-dups are real families, background ~0.
      val fam = (col("doc_id") % 10000000L).cast("string")
      val div = docs.select(col("doc_id"),
        array_join(transform(split(trim(lower(col("text"))), "\\s+"),
          w => substring(md5(concat(w, lit(":"), fam)), 1, 8)), " ")
          .as("text"))
        .localCheckpoint(false)
      val hist = div.filter(col("doc_id") % 10 =!= 0)
      var prepared = timed(s"prepareCorpus (${hist.count()} docs)") {
        operators.Dedup.prepareCorpus(hist, "text", "doc_id")
      }
      (0 until 3).foreach { w =>
        val wave = div.filter(col("doc_id") % 30 === w * 10)
        val waveN = wave.count()
        val novel = timed(s"wave $w: screen ($waveN docs)") {
          operators.Dedup.incrementalDedupPrepared(wave, prepared,
            "text", "doc_id", jaccardThreshold = 0.5)
            .localCheckpoint(false)
        }
        val novelN = novel.count()
        prepared = timed(s"wave $w: absorb ($novelN novel)") {
          operators.Dedup.checkpointCorpusIndex(
            operators.Dedup.updateCorpusIndex(prepared, novel,
              "text", "doc_id"))
        }
        println(s"[soak]   wave $w: $waveN screened, $novelN novel")
      }
      spark.stop()
      return
    }

    if (mode == "bpe") {
      // certified-batched BPE training at a REAL vocab size (>= 1k
      // merges): the diversified-vocabulary fixture (one private
      // vocabulary per base doc, see divvocab) gives the pair
      // diversity a 1k-merge table needs — the flat ~50-word corpus
      // exhausts its merge space in the low hundreds. The row records
      // merges vs corpus PASSES: the batched trainer's whole point is
      // passes << merges while the merge ORDER stays sequential-exact
      // (certified acceptance, BpeSpec).
      val fam = (col("doc_id") % 10000000L).cast("string")
      val div = docs.select(col("doc_id"),
        array_join(transform(split(trim(lower(col("text"))), "\\s+"),
          w => substring(md5(concat(w, lit(":"), fam)), 1, 8)), " ")
          .as("text"))
        .localCheckpoint(false)
      println(s"[soak] diversified corpus: ${div.count()} docs")
      val vocab = 1024
      val t0 = System.nanoTime()
      val (merges, passes) = timed(
          s"learnBpeMergesBatched($vocab merges, batch=64)") {
        operators.TextAnalysis.learnBpeMergesBatchedCounted(
          div, "text", vocab, 64,
          onPass = (p, m) => if (p % 25 == 0) println(
            f"[soak]   pass $p: $m merges, " +
              f"${(System.nanoTime() - t0) / 1e9}%.0f s"))
      }
      println(s"[soak]   -> ${merges.length} merges in $passes passes " +
        f"(${merges.length.toDouble / passes}%.1f merges/pass)")
      // the learned table round-trips the model convention
      implicit val sp = spark
      operators.TextAnalysis.saveBpeMerges(merges,
        s"/tmp/graft_soak_bpe_r$replicas/merges")
      val loaded = operators.TextAnalysis.loadBpeMerges(
        s"/tmp/graft_soak_bpe_r$replicas/merges")
      require(loaded == merges, "merge-table round trip diverged")
      val toks = timed("bpeTokens under the learned table (full corpus)") {
        operators.TextAnalysis.bpeTokens(div, "text", "doc_id", merges)
          .count()
      }
      println(s"[soak]   -> $toks subword tokens")
      spark.stop()
      return
    }

    if (mode == "r15") {
      // the r15 additions at replica scale: the KN trigram gate (model
      // trained on a 1-in-13 reference slice, every doc scored), the
      // perceptron quality filter (corpus + garbled twins = 2x docs,
      // 3 whole-corpus epochs), and hybrid retrieval (BM25 top-8-term
      // query-by-example + beam ANN + RRF) serving 1% of the corpus as
      // queries against the rest.
      val ref = docs.filter(col("doc_id") % 13 === 0)
      timed(s"knTrigramScore (q188 shape, ${docs.count()} docs)") {
        val model = operators.TextAnalysis.knTrigramModel(ref, "text")
        val scored = operators.TextAnalysis.knTrigramScore(docs, model,
          "text", "doc_id")
        val n = scored.count()
        val mean = scored.agg(avg(col("kn_mean"))).head.getDouble(0)
        println(f"[soak]   -> $n scored, mean kn_mean $mean%.4f")
      }
      val junk = docs.select((col("doc_id") + lit(900000000L))
          .as("doc_id"),
        array_join(transform(split(trim(lower(col("text"))), "\\s+"),
          w => substring(md5(concat(w, lit(":junk"))), 1, 8)), " ")
          .as("text"))
      val labeled = docs.select(col("doc_id"), col("text"),
          lit(1L).as("label"))
        .unionByName(junk.select(col("doc_id"), col("text"),
          lit(-1L).as("label")))
      timed(s"perceptronTrain+score (q190 shape, ${labeled.count()} " +
          "docs, 3 epochs)") {
        val w = operators.Classifier.perceptronTrain(
          labeled.filter(col("doc_id") % 3 =!= 0), "text", "doc_id",
          "label", 4096, 3)
        val eval = operators.Classifier.perceptronScore(
            labeled.filter(col("doc_id") % 3 === 0), w, "text",
            "doc_id", 4096)
          .join(labeled.select(col("doc_id"), col("label")),
            Seq("doc_id"))
          .select((col("predicted") === (col("label") > 0))
            .cast("long").as("c"))
          .agg(sum(col("c")).as("c"), count(lit(1)).as("n")).head
        println(s"[soak]   -> eval ${eval.getLong(0)}/${eval.getLong(1)}")
      }
      val embBase = Tables.load(spark, sfDir, "embeddings")
      val embPath = s"/tmp/graft_soak_emb_r$replicas"
      (0 until replicas).map { k =>
        embBase.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          transform(col("embedding"),
            x => x + lit((k % 13) * 0.07f)).as("embedding"))
      }.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(embPath)
      val emb = spark.read.parquet(embPath)
      val old = emb.filter(col("vec_id") % 100 =!= 1)
      val queries = emb.filter(col("vec_id") % 100 === 1)
      println(s"[soak] hybrid corpus: ${old.count()} vectors, " +
        s"${queries.count()} queries")
      val graph = timed("nnDescent backbone (k=4, 2 rounds)") {
        val g = operators.Ann.nnDescentPortable(old, "embedding",
          "vec_id", 4, 2, 1000).localCheckpoint(false)
        g.count(); g
      }
      timed("hybrid retrieval (q191 shape: BM25 top-8 terms + beam + " +
          "RRF)") {
        val corpusDocs = docs.join(old.select(col("vec_id")
          .as("doc_id")), Seq("doc_id"), "left_semi")
        val queryTerms = docs.join(queries.select(col("vec_id")
            .as("doc_id")), Seq("doc_id"), "left_semi")
          .select(col("doc_id").as("query_id"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
          .filter(col("term") =!= "")
          .groupBy(col("query_id"), col("term"))
          .agg(count(lit(1)).as("__tf"))
          .withColumn("__rn", org.apache.spark.sql.functions
            .row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("query_id"))
              .orderBy(col("__tf").desc, col("term").asc)))
          .filter(col("__rn") <= 8)
          .select(col("query_id"), col("term"))
        val bm25 = operators.TextAnalysis.bm25FixedPointTopK(
            corpusDocs, "text", "doc_id", queryTerms, 8)
          .withColumn("rank", org.apache.spark.sql.functions
            .row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("query_id"))
              .orderBy(col("score_q").desc,
                col("doc_id").cast("string").asc)).cast("long"))
          .select(col("query_id"), col("doc_id"), col("rank"))
        val ann = operators.Ann.beamSearchPortable(graph, old, queries,
            "embedding", "vec_id", 8, 8, 2)
          .select(col("id").as("query_id"),
            col("neighbor_id").as("doc_id"), col("rank"))
        val fused = operators.TextAnalysis.reciprocalRankFusion(
          Seq(bm25, ann), "query_id", "doc_id", "rank", 60, 8)
        println(s"[soak]   -> ${fused.count()} fused rows")
      }
      spark.stop()
      return
    }

    val pairs = operators.Dedup.minhashLsh(docs, "text", "doc_id",
      ngram = 3, numHashes = 16, bands = 4, jaccardThreshold = 0.5)
      .localCheckpoint(false)
    val nPairs = timed("minhashLsh pairs")(pairs.count())
    println(s"[soak]   -> $nPairs candidate-verified pairs")

    val assignments = timed("components + cluster sizes") {
      val a = operators.Components.dedupAssignments(docs, "doc_id", pairs,
        "id_a", "id_b").localCheckpoint(false)
      val clusters = a.groupBy(col("keep_id")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2).count()
      println(s"[soak]   -> $clusters clusters of size >= 2")
      a
    }

    if (mode == "chain") {
      // the headline 100 TB chain, end-to-end: the pair list and
      // cluster assignments above, then the leakage-safe split over
      // the SAME near-dup graph — every replica family must land in
      // one split (the eval-contamination guard at scale)
      val splitDf = timed("leakageSafeSplit (val 100 / test 100 permille)") {
        val d = operators.Sampling.leakageSafeSplit(docs, "doc_id", pairs,
          "id_a", "id_b", valPermille = 100, testPermille = 100,
          seed = 42, maxIter = 40).localCheckpoint(false)
        d.count()
        d
      }
      val split = splitDf.groupBy(col("split"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"[soak]   -> split sizes: $split")
      // no near-dup family straddles a split: each cluster maps to ONE
      // split value (the guard the operator exists for — checked at
      // soak scale, not just in the spec)
      val straddlers = assignments
        .join(splitDf, col("id") === col("doc_id"))
        .groupBy(col("keep_id"))
        .agg(countDistinct(col("split")).as("ns"))
        .filter(col("ns") > 1).count()
      println(s"[soak]   -> $straddlers clusters straddling splits")
      require(straddlers == 0, s"leakage: $straddlers straddling clusters")
      spark.stop()
      return
    }

    if (mode == "curation") {
      // the q169 end-to-end curation shape at replica scale: map-only
      // gates over the full soak corpus, dup-drop against the pair list
      // computed above, then prefix-sum packing of the survivors — the
      // r13 flagship composition under soak load
      val quality = operators.TextAnalysis
        .gopherQuality(docs, "text", "doc_id")
        .select(col("doc_id"), col("keep").as("keep_quality"))
      val blocked = operators.TextAnalysis.blocklistGate(docs, "text",
          "doc_id", Seq("dup dup", "slow slow", "spam"))
        .select(col("doc_id"), col("blocked"))
      val nBlocked = timed("blocklist gate (Aho-Corasick, map-only)") {
        blocked.filter(col("blocked")).count()
      }
      println(s"[soak]   -> $nBlocked docs blocked")
      // bloom decontamination against a benchmark slice of the base corpus
      val bench = base.filter(col("doc_id") % 9 === 4)
      val nContam = timed("bloom decontamination screen") {
        operators.Dedup.bloomDecontaminate(docs, bench, "text", "doc_id",
          ngram = 5, expectedItems = 1000000L).filter(col("contaminated"))
          .count()
      }
      println(s"[soak]   -> $nContam contaminated docs")
      val decided = timed("decision table + packing") {
        val dup = pairs.select(col("id_b").as("doc_id")).distinct()
          .withColumn("__d", lit(true))
        val flags = docs.select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).cast("long")
              .as("n_tokens"))
          .join(quality, Seq("doc_id"))
          .join(blocked, Seq("doc_id"))
          .join(dup, Seq("doc_id"), "left")
          .withColumn("kept", col("keep_quality") && !col("blocked") &&
            coalesce(!col("__d"), lit(true)))
        val packed = operators.Packing.assignShards(
          flags.filter(col("kept"))
            .select(col("doc_id"), col("n_tokens")),
          "n_tokens", "doc_id", maxTokensPerShard = 100000L)
          .localCheckpoint(false)
        val kept = packed.count()
        val shards = packed.agg(countDistinct(col("shard_id"))).head.getLong(0)
        // packing invariant AT SOAK SCALE: no shard exceeds the budget
        // by more than one document's tokens (prefix-sum packing
        // contract — assignShards and the q169 oracle both use
        // running-offset packing, and the bound holds for it)
        val worst = packed.groupBy(col("shard_id"))
          .agg(sum(col("n_tokens")).as("t"), max(col("n_tokens")).as("m"))
          .filter(col("t") > lit(100000L) + col("m")).count()
        require(worst == 0, s"$worst shards exceed budget + one doc")
        (kept, shards)
      }
      println(s"[soak]   -> ${decided._1} docs kept into " +
        s"${decided._2} shards (budget-invariant held)")
      spark.stop()
      return
    }

    // incremental screen: one replica's worth of docs (half near-dup of the
    // corpus, half novel) probing the full soak corpus
    val batch = base.select((col("doc_id") + 900000000L).as("doc_id"),
        concat_ws(" ", lit("r0"), col("text")).as("text"))
      .filter(col("doc_id") % 2 === 0)
      .unionByName(base.select((col("doc_id") + 910000000L).as("doc_id"),
        concat_ws(" ", lit("novel"), col("doc_id"),
          regexp_replace(col("text"), "([^ ]+)", "x$1x")).as("text"))
        .filter(col("doc_id") % 2 === 1))
    val kept = timed("incremental dedup (batch vs corpus, one-shot)") {
      operators.Dedup.incrementalDedup(batch, docs, "text", "doc_id",
        jaccardThreshold = 0.5).count()
    }
    println(s"[soak]   -> ${batch.count()} batch docs, $kept kept")

    // the streaming-ingest shape: corpus-side state paid once, then each
    // probe is batch-proportional — the second probe shows the steady state
    val prepared = timed("prepareCorpus (one-time corpus-side cost)") {
      operators.Dedup.prepareCorpus(docs, "text", "doc_id")
    }
    val keptP = timed("incremental dedup (prepared probe #1)") {
      operators.Dedup.incrementalDedupPrepared(batch, prepared, "text",
        "doc_id", jaccardThreshold = 0.5).count()
    }
    require(keptP == kept, s"prepared probe diverged: $keptP != $kept")
    timed("incremental dedup (prepared probe #2, steady state)") {
      operators.Dedup.incrementalDedupPrepared(batch, prepared, "text",
        "doc_id", jaccardThreshold = 0.5).count()
    }

    // r5 shapes: span dedup (3 narrow shuffles + per-doc reassembly) and
    // the strided substring self-join — the replicas share everything
    // after the marker token, so both paths fire heavily
    val spanStats = timed("span dedup (10-word spans)") {
      operators.Dedup.spanDedup(docs, "text", "doc_id", spanWords = 10)
        .agg(sum(col("n_dropped")).as("dropped"),
          sum(col("n_spans")).as("spans"))
        .collect()(0)
    }
    println(s"[soak]   -> ${spanStats.getAs[Long]("dropped")} of " +
      s"${spanStats.getAs[Long]("spans")} spans dropped")
    val subPairs = timed("exact-substring dup join (w=40, stride=10)") {
      operators.Dedup.exactSubstringDupJoin(docs, "text", "doc_id",
        window = 40, stride = 10).count()
    }
    println(s"[soak]   -> $subPairs substring-dup pairs")

    // r8 shapes: the curation trio past bench SF. SemDeDup runs with
    // nlist ∝ N (the q81 r7-verdict fix) and a Lloyd-refined quantizer —
    // the configuration the operator docs prescribe at scale.
    val embBase = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val embPath = s"/tmp/graft_soak_embs_r$replicas"
    (0 until replicas).map { k =>
      // replica k: ids shifted, every coordinate nudged by a per-replica
      // epsilon — replicas of a vector are semantic near-dups (cosine≈1)
      embBase.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        transform(col("embedding"), x => x + lit(k * 0.0003)).as("embedding"))
    }.reduce(_.unionByName(_)).write.mode("overwrite").parquet(embPath)
    val embs = spark.read.parquet(embPath)
    val nVecs = embs.count()
    // 32 clusters at bench SF (2k vectors), grown linearly with the
    // corpus — UNCAPPED since r10: past Ann.centroidTableThreshold the
    // assignment auto-switches to the broadcast centroid-table path, so
    // large nlist no longer hits the literal-chain codegen wall
    val nlist = math.max(32, (32L * nVecs / 2000L).toInt)
    val cents = timed(s"kmeansCentroidsPortable (nlist=$nlist, 1 iter)") {
      operators.Ann.kmeansCentroidsPortable(embs, "embedding", "vec_id",
        nlist, iters = 1)
    }
    val nDropped = timed("semanticDedup (nlist prop. to N, learned quantizer)") {
      operators.Dedup.semanticDedup(embs, "embedding", "vec_id",
        cosineThreshold = 0.99, nlist = nlist, centroids = Some(cents))
        .count()
    }
    println(s"[soak]   -> $nDropped of $nVecs vectors semantically dropped")

    val nShards = timed("shard packing (2000-token shards)") {
      val toks = docs.select(col("doc_id"),
        operators.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
      operators.Packing.assignShards(toks, "n_tokens", "doc_id", 2000L)
        .agg(countDistinct(col("shard_id")).as("n")).collect()(0).getLong(0)
    }
    println(s"[soak]   -> $nShards shards")

    // production-nlist assignment shape: 1024 centroids force the
    // broadcast-table path (literal chains stop codegen'ing far below
    // this) — full corpus assigned, result reduced to a cluster census
    val embDim = operators.Ann.dimOf(embs, "embedding")
    val bigCents = (0 until 1024).map(i =>
      (0 until embDim).map(d => ((i * 31 + d * 17) % 101 - 50).toLong))
    val nClusters = timed("centroid-table assignment (nlist=1024)") {
      operators.Ann.withNearestCentroidL(
          embs.select(col("vec_id"),
            operators.Ann.quantizeVec(col("embedding"), 1000).as("qv")),
          bigCents, col("qv"), "cluster")
        .agg(countDistinct(col("cluster"))).collect()(0).getLong(0)
    }
    println(s"[soak]   -> $nClusters of 1024 clusters populated")

    // r13 shape: NN-Descent kNN graph on the replicated embeddings —
    // per-round cost is O(n·k²) scored pairs by construction (capped
    // reverse lists bound the hub fan-out), so the rounds should scale
    // linearly with the corpus
    val knnRows = timed("nnDescent kNN graph (k=4, 2 rounds)") {
      operators.Ann.nnDescentPortable(embs, "embedding", "vec_id",
        k = 4, rounds = 2).count()
    }
    println(s"[soak]   -> $knnRows kNN edges over $nVecs vectors")

    val topk = timed("quantized brute-force top-k (int8 domain, 8 queries)") {
      operators.Ann.quantizedTopK(embs, embs.filter(col("vec_id") < 8),
        "embedding", "vec_id", "vec_id", k = 10).count()
    }
    println(s"[soak]   -> $topk (query, neighbor) rows")

    // r8 additions: the classifier is the map-only best case (should
    // scale linearly); pagerank is the iterative join worst case
    val scored = timed("hashed linear classifier (md5-portable)") {
      operators.TextAnalysis.hashedLinearScore(docs, "text", "doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
        .collect()(0)
    }
    println(s"[soak]   -> ${scored.getAs[Long]("kept")} of " +
      s"${scored.getAs[Long]("n")} docs pass the quality gate")
    val scoredFast = timed("hashed linear classifier (xxhash64 fast path)") {
      operators.TextAnalysis.hashedLinearScoreFast(docs, "text", "doc_id")
        .agg(count(lit(1)).as("n")).collect()(0).getLong(0)
    }
    println(s"[soak]   -> $scoredFast docs scored (fast path)")

    // NOTE: prefixFilterJoin is deliberately NOT in the soak rotation —
    // the synthetic corpus's ~31-word vocabulary is its structural worst
    // case (no rare tokens ⇒ prefixes don't discriminate ⇒ candidates
    // degrade toward all-pairs, quadratic in the replica count). The
    // operator documents this; minhashLsh is the sweep path here.
    val prRows = timed("fixed-point pagerank (replica-pair graph, 3 iters)") {
      // near-dup pairs as the edge list — the graph PageRank would rank
      // in a curation pipeline (which cluster representatives matter)
      val sym = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      operators.PageRank.pageRankFixedPoint(sym, "a", "b", iters = 3).count()
    }
    println(s"[soak]   -> $prRows ranked nodes")

    // r9 shapes: BM25 (broadcast-prune + heap top-k — the corpus-sized
    // stage must stay one map) and triangle counting on the replica-pair
    // graph (each base doc's replicas are pairwise-similar ⇒ near-clique
    // per doc ⇒ the wedge join's dense-neighborhood stress case)
    val bmQueries = SketchParams.q112.queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
    val bmRows = timed("bm25 top-10 (3 queries, double scorer)") {
      import spark.implicits._
      operators.TextAnalysis.bm25TopK(docs, "text", "doc_id",
        bmQueries.toDF("query_id", "term"), k = 10).count()
    }
    println(s"[soak]   -> $bmRows (query, doc) rows")
    val triNodes = timed("triangle counts (replica-pair near-clique graph)") {
      operators.Components.triangleCounts(pairs, "id_a", "id_b").count()
    }
    println(s"[soak]   -> $triNodes nodes in >=1 triangle")
    val coreNodes = timed("k-core (k=5, iterative peel on the same graph)") {
      operators.Components.kCore(pairs, "id_a", "id_b", k = 5).count()
    }
    println(s"[soak]   -> $coreNodes nodes in the 5-core")

    // r11 shapes: multi-source BFS and EM weight calibration past bench
    // SF. The chain graph (replica k of a doc linked to replica k+1)
    // forces genuine multi-hop frontiers — every round's cost is the
    // frontier⋈edges join, and the frontier holds ~|seeds| nodes per
    // hop by construction, so per-hop wall measures the round cost, not
    // early termination.
    val chain0 = (0 until replicas - 1).map { k =>
      base.select((col("doc_id") + lit(k * 10000000L)).as("a"),
        (col("doc_id") + lit((k + 1) * 10000000L)).as("b"))
    }.reduce(_.unionByName(_))
    val chainEdges = chain0
      .unionByName(chain0.select(col("b").as("a"), col("a").as("b")))
    val bfsSeeds = base.select(col("doc_id").as("node"))
    val hopRows = timed(s"bfsHopDistance (chain graph, maxHops=8)") {
      operators.Components.bfsHopDistance(chainEdges, "a", "b",
        bfsSeeds, "node", maxHops = 8).count()
    }
    println(s"[soak]   -> $hopRows nodes settled (chain)")
    val hopDense = timed("bfsHopDistance (near-dup pair graph, maxHops=4)") {
      val sym = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      operators.Components.bfsHopDistance(sym, "a", "b",
        docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("node")),
        "node", maxHops = 4).count()
    }
    println(s"[soak]   -> $hopDense nodes settled (dense)")

    // EM calibration: replicas of a base customer share a block, so the
    // candidate set is |base| · C(replicas, 2) pairs; field noise (every
    // 3rd replica's segment rewritten, odd replicas' balance nudged)
    // gives the mixed agreement patterns EM separates. Per-iteration
    // cost = one pure map + one partial-reduced agg over the pair count.
    val custBase = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_nationkey").cast("long").as("nat"),
        expr("CAST(c_acctbal AS LONG) DIV 100").as("bal0"))
    val recs = (0 until replicas).map { k =>
      custBase.select(
        (col("c_custkey") + lit(k * 10000000L)).as("id"),
        when(col("c_custkey") % 3 === k % 3, lit("SEG-NOISE"))
          .otherwise(col("c_mktsegment")).as("seg"),
        col("nat"),
        (col("bal0") + lit(k % 2)).as("bal"),
        col("c_custkey").as("blk"))
    }.reduce(_.unionByName(_))
    val cands = recs.select(col("id").as("id_a"), col("blk").as("__ba"))
      .join(recs.select(col("id").as("id_b"), col("blk").as("__bb")),
        col("__ba") === col("__bb") && col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val nCands = cands.count()
    val em = timed(s"estimateWeightsEM ($nCands pairs, 4 iters)") {
      operators.Linkage.estimateWeightsEM(recs, "id",
        Seq("seg", "nat", "bal"), cands, iters = 4)
    }
    println(f"[soak]   -> pi=${em.pi}%.4f over $nCands%d candidate pairs")

    // r12 shapes: the labeling / clustering-evaluation family past bench
    // SF (VERDICT r11 item 4). The near-dup pair graph (per-doc replica
    // near-cliques) is LPA's dense fast-converging case; the chain graph
    // is its slow case — labels must travel the replica chain, so every
    // round's two shuffles (edges⋈labels + (node,label) argmax agg) do
    // real frontier work and the orbit detector pays its per-round
    // equi-join check against genuinely-changing labelings.
    val lpaDense = timed("labelPropagation (near-dup graph, 4 iters)") {
      val l = operators.Components.labelPropagation(pairs, "id_a", "id_b",
        iters = 4).localCheckpoint(false)
      println(s"[soak]   -> ${l.select(countDistinct(col("label")))
        .collect()(0).getLong(0)} labels over ${l.count()} nodes (dense)")
      l
    }
    val (chainLabels, chainIters) =
      timed(s"labelPropagationConverged (chain graph, maxIters=12)") {
        operators.Components.labelPropagationConverged(chainEdges, "a", "b",
          maxIters = 12)
      }
    println(s"[soak]   -> orbit after $chainIters rounds, " +
      s"${chainLabels.select(countDistinct(col("label"))).collect()(0)
        .getLong(0)} labels (chain)")
    timed("weightedLabelPropagation (near-dup graph, 4 iters)") {
      // weight = a small deterministic function of the pair — exercises
      // the weighted pre-sum + max-symmetrization path at full width
      operators.Components.weightedLabelPropagation(
        pairs.withColumn("w", pmod(col("id_a") + col("id_b"), lit(7L)) + 1L),
        "id_a", "id_b", "w", iters = 4).count()
    }
    val mod = timed("modularity (grade dense LPA labels on its graph)") {
      operators.Components.modularity(pairs, "id_a", "id_b",
        lpaDense, "node", "label").collect()(0)
    }
    println(f"[soak]   -> Q=${mod.getAs[Double]("modularity")}%.4f over " +
      s"${mod.getAs[Long]("n_communities")} communities, " +
      s"${mod.getAs[Long]("m_edges")} edges")
    val ri = timed("randIndex (LPA labels vs connected components)") {
      operators.Components.randIndex(lpaDense, "node", "label",
        assignments, "id", "keep_id").collect()(0)
    }
    println(f"[soak]   -> RI=${ri.getAs[Double]("rand_index")}%.6f over " +
      s"${ri.getAs[Long]("n_pairs")} pairs of ${ri.getAs[Long]("n_nodes")}" +
      " nodes")

    // r12: single-linkage MSF over the near-dup graph (quantized
    // jaccard as the weight) — Borůvka's per-round cost is the two
    // edge⋈label joins + the star-CC over forest edges; the replica
    // near-cliques converge in few rounds. Measured twice (warm JVM)
    // for the within-15% check.
    val wEdges = pairs.withColumn("wq",
      (col("jaccard") * lit(1000)).cast("long"))
    for (run <- 1 to 2) {
      val msfEdges = timed(s"minimumSpanningForest (near-dup graph, run $run)") {
        operators.Components.minimumSpanningForest(wEdges,
          "id_a", "id_b", "wq").count()
      }
      println(s"[soak]   -> $msfEdges forest edges")
    }

    // sweep-line pair at 30× the q138/q139 interval count: every order's
    // [orderdate, last shipdate) interval replicated with a per-replica
    // day shift — distinct event times, same 5 priority groups, so each
    // window task sorts ~replicas× the bench events (the per-task-memory
    // bound the operator documents).
    val iv0 = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate"))
      .agg(max(col("l_shipdate")).as("end_ts"))
      .select(col("o_orderpriority"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("s_us"),
        unix_micros(col("end_ts").cast("timestamp")).as("e_us"))
      .localCheckpoint(false)
    val dayUs = 86400L * 1000000L
    val ivRep = (0 until replicas).map { k =>
      iv0.select(col("o_orderpriority"),
        (col("s_us") + lit(k * dayUs)).as("s_us"),
        (col("e_us") + lit(k * dayUs)).as("e_us"))
    }.reduce(_.unionByName(_))
    val peak = timed(s"maxConcurrency (${replicas}x order intervals)") {
      operators.Stats.maxConcurrency(ivRep, "s_us", "e_us",
        Seq("o_orderpriority"))
        .agg(max(col("max_concurrent"))).collect()(0).getLong(0)
    }
    println(s"[soak]   -> peak concurrency $peak")
    val covered = timed(s"coveredTime (${replicas}x order intervals)") {
      operators.Stats.coveredTime(ivRep, "s_us", "e_us",
        Seq("o_orderpriority"))
        .agg(sum(col("covered"))).collect()(0).getLong(0)
    }
    println(s"[soak]   -> ${covered / dayUs} covered days across groups")
    spark.stop()
  }
}
