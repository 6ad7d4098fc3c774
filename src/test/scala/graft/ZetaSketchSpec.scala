package graft

import graft.functions.ZetaFormat

/** Byte-level contract of the zetasketch wire layout (r19 — the
  * offline-verifiable half of BigQuery interchange: proto framing,
  * dense register layout, merge semantics; the hash layer is
  * documented environment-limited in functions/ZetaSketch.scala). */
class ZetaSketchSpec extends SparkSpec {
  import spark.implicits._

  test("encode frames the published proto layout byte-for-byte (hand-framed vector)") {
    // p = 4 → 16 registers; two registers set
    val st = ZetaFormat.emptyState(4)
    st.numValues = 3
    st.regs(0) = 5
    st.regs(15) = 2
    val got = ZetaFormat.encode(st)
    val expected = Array[Int](
      0x08, 112,        // field 1 varint: type = HYPERLOGLOG_PLUS_UNIQUE
      0x10, 3,          // field 2 varint: num_values = 3
      0x18, 2,          // field 3 varint: encoding_version = 2
      0x82, 0x07, 20,   // field 112 length-delim (tag 898), len = 20
      0x18, 4,          //   field 3 varint: precision = 4
      0x2a, 16,         //   field 5 bytes: 16 dense registers
      5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2
    ).map(_.toByte)
    assert(got.toSeq == expected.toSeq,
      s"wire bytes drifted:\n got ${got.map(b => b & 0xff).mkString(",")}\n" +
        s" exp ${expected.map(b => b & 0xff).mkString(",")}")
  }

  test("decode(encode) is the identity on framing fields and registers") {
    val st = ZetaFormat.emptyState(10)
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to 5000).foreach(i =>
      ZetaFormat.add(st, ZetaFormat.hash64(md, s"v$i".getBytes("UTF-8"))))
    val (typ, ver, back) = ZetaFormat.decode(ZetaFormat.encode(st))
    assert(typ == 112 && ver == 2)
    assert(back.numValues == 5000 && back.p == 10)
    assert(back.regs.toSeq == st.regs.toSeq)
  }

  test("decode tolerates unknown fields and rejects sparse data loudly") {
    val bytes = ZetaFormat.encode(ZetaFormat.emptyState(4))
    // append an unknown varint field (field 9) — a real zetasketch
    // message carries value_type and more; readers must skip
    val extended = bytes ++ Array[Byte](0x48, 7)
    val (_, _, st) = ZetaFormat.decode(extended)
    assert(st.p == 4)
    // a sparse_data field (6, length-delim inside the extension) must
    // fail loudly, never silently misread registers
    val inner = Array[Byte](0x18, 4, 0x32, 1, 0)  // precision + sparse_data
    val sparse = Array[Byte](0x08, 112, 0x18, 2,
      0x82.toByte, 0x07, inner.length.toByte) ++ inner
    val e = intercept[IllegalArgumentException](ZetaFormat.decode(sparse))
    assert(e.getMessage.contains("sparse"), e.getMessage)
  }

  test("merge = per-register max + num_values sum; union estimate within bound") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val a = ZetaFormat.emptyState(12)
    val b = ZetaFormat.emptyState(12)
    (1 to 6000).foreach(i =>
      ZetaFormat.add(a, ZetaFormat.hash64(md, s"x$i".getBytes("UTF-8"))))
    // overlap: 3001..9000 — union is exactly 9000 distinct
    (3001 to 9000).foreach(i =>
      ZetaFormat.add(b, ZetaFormat.hash64(md, s"x$i".getBytes("UTF-8"))))
    ZetaFormat.merge(a, b)
    assert(a.numValues == 12000) // duplicates included, per zetasketch
    val est = ZetaFormat.estimate(a)
    assert(math.abs(est - 9000) <= 9000 * 0.05,
      s"union estimate off: $est vs 9000")
  }

  test("zeta_hll_agg / merge / info through SQL over a DataFrame") {
    graft.functions.GraftFunctions.register(spark)
    val df = (1 to 4000).map(i => (i % 4, s"u${i % 1000}"))
      .toDF("g", "u")
    df.createOrReplaceTempView("zeta_in")
    val per = spark.sql(
      """SELECT g, zeta_hll_agg(u, 14) AS sk FROM zeta_in GROUP BY g""")
    per.createOrReplaceTempView("zeta_per")
    val got = spark.sql(
      """SELECT zeta_hll_info(zeta_hll_merge_agg(sk)) AS i FROM zeta_per""")
      .select("i.sk_type", "i.encoding_version", "i.precision",
        "i.num_values", "i.estimate")
      .as[(Int, Int, Int, Long, Long)].head()
    assert(got._1 == 112 && got._2 == 2 && got._3 == 14 && got._4 == 4000)
    // 1000 distinct at p=14 is deep linear-counting range: tight bound
    assert(math.abs(got._5 - 1000) <= 25, s"estimate ${got._5}")
  }
}
