package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text canonicalization + policy matching, both kept inside whole-stage
 * codegen (a static-call `doGenCode` for the normalizer; a reference-object
 * call for the compiled automaton) so a 100-TB cleaning pass stays in one
 * generated loop per stage with no virtual `eval` per row.
 */
object TextNormalize {
  /**
   * Canonical text form for dedup/matching: Unicode NFC, ROOT-locale
   * lowercase, whitespace runs collapsed to one space, ends trimmed.
   *
   * The whitespace class is the EXPLICIT `[ \t\n\r\f]` — Java's `\s` also
   * eats U+000B while RE2-family engines don't, and the canonical form must
   * replay identically everywhere (DuckDB mirror:
   * `trim(regexp_replace(lower(nfc_normalize(x)), '[ \t\n\r\f]+', ' ', 'g'), ' ')`).
   */
  def normalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    var pendingSpace = false
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        pendingSpace = sb.length() > 0 // leading whitespace drops entirely
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/**
 * `normalize_text(text)`: see [[TextNormalize.normalize]]. Null-intolerant;
 * codegen emits a direct static call, so the expression fuses into the
 * surrounding generated stage.
 */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
  override def prettyName: String = "normalize_text"
}

/**
 * Aho–Corasick multi-pattern automaton over UTF-16 chars: one linear pass
 * answers "does the text contain ANY of the N phrases as a substring".
 * Built once on the driver from the (small, broadcastable) blocklist and
 * shipped to executors as a codegen reference object, so match cost is
 * O(text length) independent of N — the property that separates a
 * 10⁴-phrase policy blocklist at 100 TB from a chain of `contains()`
 * calls, whose cost is O(text × N).
 *
 * Exact-substring, case-sensitive semantics (compose with
 * [[NormalizeText]] upstream for canonicalized matching). Arrays-of-maps
 * keep construction simple; the automaton is built once per plan, not per
 * row or per task.
 */
final class AhoCorasick(phrases: Seq[String]) extends Serializable {
  require(phrases.nonEmpty, "phrase list must not be empty")
  require(phrases.forall(_.nonEmpty), "phrases must be non-empty strings")

  // goto(state)(char) -> state; terminal(state) = some phrase ends here
  // (propagated through fail links at build time, so matching never walks
  // the fail chain per character).
  private val goto_ = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val terminal = mutable.ArrayBuffer(false)
  private val fail = mutable.ArrayBuffer(0)

  phrases.foreach { p =>
    var s = 0
    p.foreach { c =>
      s = goto_(s).getOrElseUpdate(c, {
        goto_ += mutable.HashMap.empty[Char, Int]
        terminal += false
        fail += 0
        goto_.size - 1
      })
    }
    terminal(s) = true
  }

  locally { // BFS fail links; fold fail-transitions into goto (automaton form)
    val queue = mutable.Queue.empty[Int]
    goto_(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      terminal(s) = terminal(s) || terminal(fail(s))
      goto_(s).foreach { case (c, t) =>
        fail(t) = goto_(fail(s)).getOrElse(c, 0)
        queue.enqueue(t)
      }
      // complete transitions so matching is a pure table walk
      goto_(fail(s)).foreach { case (c, t) =>
        if (!goto_(s).contains(c)) goto_(s).update(c, t)
      }
    }
  }

  private val gotoFrozen: Array[Map[Char, Int]] = goto_.map(_.toMap).toArray
  private val terminalFrozen: Array[Boolean] = terminal.toArray

  def containsAny(text: UTF8String): Boolean = {
    val s = text.toString
    var state = 0
    var i = 0
    while (i < s.length) {
      state = gotoFrozen(state).getOrElse(s.charAt(i), 0)
      if (terminalFrozen(state)) return true
      i += 1
    }
    false
  }
}

/**
 * `contains_any_phrase(text, blocklist)`: true iff any blocklist phrase
 * occurs in `text` as a raw substring. Null-intolerant.
 */
case class ContainsAnyPhrase(child: Expression, phrases: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType

  @transient private lazy val automaton = new AhoCorasick(phrases)

  override def nullSafeEval(input: Any): Any =
    automaton.containsAny(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$ref.containsAny($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ContainsAnyPhrase =
    copy(child = newChild)
  override def prettyName: String = "contains_any_phrase"
}

object TextPolicyFunctions {
  /** Canonical text form: NFC, lowercase, collapsed whitespace, trimmed. */
  def normalize_text(text: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(text)))

  /** True iff any of `phrases` occurs in `text` as a substring (one linear
   *  Aho–Corasick pass, cost independent of the blocklist size). */
  def contains_any_phrase(text: Column, phrases: Seq[String]): Column =
    Bridge.column(ContainsAnyPhrase(Bridge.expression(text), phrases))
}
