package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the dedup hot path (SURVEY §7.4's
 * "custom expressions for dedup" slot).
 *
 * The higher-order-function formulation (`transform` + `array_min` per
 * hash seed) evaluates an interpreted lambda per (element, seed) —
 * measured at ~13 s for 5k docs × 400 shingles × 16 seeds. These
 * expressions do the same work in one tight JVM loop per row:
 * MinHash uses the standard two-hash mixing family
 * h_j(x) = h1(x) + j·h2(x) (Indyk; used by every large-scale MinHash
 * implementation), so each element is hashed twice regardless of k.
 *
 * Codegen policy: the ARRAY-BUILDING expressions (MinHash, SimHash,
 * shingles) stay CodegenFallback — their per-row cost is one virtual
 * call amortized over hundreds of elements, and they sit in map-only
 * projection stages. The SCALAR comparators (DotProduct, Hamming)
 * implement real `doGenCode`: they run inside the similarity SCORING
 * stages next to codegen'd arithmetic/filters, where a single fallback
 * expression would collapse the whole WholeStageCodegen span to
 * interpreted evaluation.
 */
object HashExpressions {

  /** k-MinHash signature of an array<string> (order- and
    * duplicate-insensitive once the input is a set). */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0, "k must be positive")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"
    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h1 = XxHash64Function.hash(s, StringType, 42L)
        val h2 = XxHash64Function.hash(s, StringType, 1042L) | 1L // odd → full-period mixing
        var j = 0
        var hj = h1
        while (j < k) {
          if (hj < sig(j)) sig(j) = hj
          hj += h2
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
  }

  /** 64-bit SimHash of an array<string> token multiset: every token
    * votes ±1 on each bit of its xxhash64; bit i of the result is the
    * sign of vote sum i. */
  case class SimHash(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override protected def withNewChildInternal(newChild: Expression): SimHash =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
        i += 1
      }
      var out = 0L
      var bit = 0
      while (bit < 64) {
        if (votes(bit) > 0) out |= (1L << bit)
        bit += 1
      }
      java.lang.Long.valueOf(out)
    }
  }

  /** w-token shingles of an array<string>, optionally de-duplicated
    * (first-occurrence order, matching array_distinct). Native for the
    * same reason as MinHash: the HOF formulation (transform + slice +
    * concat_ws + filter + array_distinct) interprets several lambdas
    * per token. */
  case class TokenShingles(child: Expression, w: Int, distinct: Boolean)
      extends UnaryExpression with CodegenFallback {
    require(w > 0, "w must be positive")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "token_shingles"
    override protected def withNewChildInternal(newChild: Expression): TokenShingles =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < w) return new GenericArrayData(Array.empty[Any])
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
      val list = new scala.collection.mutable.ArrayBuffer[Any](n - w + 1)
      var i = 0
      while (i <= n - w) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](w)
        var j = 0
        while (j < w) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        val shingle = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
        if (distinct) out.add(shingle) else list += shingle
        i += 1
      }
      if (distinct) new GenericArrayData(out.toArray())
      else new GenericArrayData(list.toArray)
    }
  }

  /** The seeded ±1 plane family behind the LSH signatures — ONE
    * generator for the expression below, [[graft.similarity.Similarity.hyperplanes]]
    * (which delegates here) and, transitively, the oracle-side plane
    * literals, so the three can never drift. */
  private[graft] def planeFamily(dim: Int, bits: Int,
                                 seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** All `seeds.length` multi-table hyperplane signatures of one
    * vector in a single fused pass — exactly
    * `array(hyperplaneSignature(vec, dim, bits, s) for s <- seeds)`,
    * bit-identical by construction: per bit the same sequential-fold
    * dot over min(|vec|, dim) elements, the same `> 0` test (NaN and
    * null dots both leave the bit 0, matching the when/otherwise
    * formulation), bit i at `1L << i`, and a NULL vector yields the
    * all-zero signature array (when(null > 0) falls to otherwise(0)).
    *
    * Why native (r21, guide §4): the expression-tree formulation puts
    * tables×bits DotProduct loops INSIDE the Generate (posexplode)
    * operator's generated method; at 12 tables × 4 bits the method
    * crosses the JVM's JIT size ceiling and the whole stage executes
    * in the bytecode interpreter — measured 35 s for 200k vectors at
    * the corpus100 tier vs 0.3 s for the identical arithmetic in a
    * Project (where Spark splits generated code into JIT-able
    * methods). One CodegenFallback call keeps the Generate method
    * tiny at ANY (tables, bits); the loop itself is the tight-JVM-loop
    * policy every array-building expression in this file follows. */
  case class HyperplaneSignatures(child: Expression, dim: Int, bits: Int,
                                  seeds: Seq[Long])
      extends UnaryExpression with CodegenFallback {
    require(bits > 0 && bits <= 64, "bits must fit a 64-bit signature")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "hyperplane_signatures"
    override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatures =
      copy(child = newChild)

    @transient private lazy val planes: Array[Array[Array[Double]]] =
      seeds.map(planeFamily(dim, bits, _)).toArray

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val out = new Array[Long](seeds.length)
      val v = child.eval(input)
      if (v != null) {
        val x = v.asInstanceOf[ArrayData]
        val xn = x.numElements()
        var t = 0
        while (t < planes.length) {
          val fam = planes(t)
          var sig = 0L
          var i = 0
          while (i < fam.length) {
            val h = fam(i)
            val n = math.min(xn, h.length)
            var acc = 0.0
            var j = 0
            while (j < n) { acc += x.getDouble(j) * h(j); j += 1 }
            if (acc > 0) sig |= (1L << i)
            i += 1
          }
          out(t) = sig
          t += 1
        }
      }
      new GenericArrayData(out)
    }
  }

  /** Hamming distance between two 64-bit fingerprints (popcount of
    * XOR) — the SimHash near-dup comparator. Codegen'd so the
    * candidate-verification filter stays one compiled span. */
  case class HammingDistance64(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "hamming64"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance64 =
      copy(left = l, right = r)
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Integer.valueOf(
        java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  }

  /** Dot product of two array<double> columns in one fused loop.
    * The `aggregate(zip_with(...))` formulation allocates a zipped
    * array and interprets two lambdas per element; this is the hot
    * inner op of every similarity-search pair evaluation, so it
    * generates the same sequential-fold loop into the scoring stage's
    * compiled code (identical summation order ⇒ identical bits to the
    * interpreted path and the DuckDB oracle). */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |final int $n = Math.min($x.numElements(), $y.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
  }

  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  def dotProduct(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  def hamming64(a: Column, b: Column): Column =
    toCol(HammingDistance64(toExpr(a), toExpr(b)))

  def tokenShingles(tokens: Column, w: Int, distinct: Boolean): Column =
    toCol(TokenShingles(toExpr(tokens), w, distinct))

  def minhashSignature(arr: Column, k: Int): Column =
    toCol(MinHashSignature(toExpr(arr), k))

  def simhash64(tokens: Column): Column =
    toCol(SimHash(toExpr(tokens)))

  def hyperplaneSignatures(vec: Column, dim: Int, bits: Int,
                           seeds: Seq[Long]): Column =
    toCol(HyperplaneSignatures(toExpr(vec), dim, bits, seeds))
}
