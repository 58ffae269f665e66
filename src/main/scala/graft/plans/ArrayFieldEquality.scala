package graft.plans

/** Content equality for expressions that carry constant Array fields.
  *
  * Scala case-class equality compares Array fields by REFERENCE, so two
  * structurally identical kernel instances (same codebook values, same
  * coefficient table) never compare equal. Catalyst leans on expression
  * equality everywhere — `semanticEquals`, common-subexpression
  * elimination, exchange/subquery reuse — and all of those silently
  * stop matching subtrees containing such a kernel. Mixing this trait
  * into the case class restores structural equality: every product
  * element is compared with deep-array semantics.
  *
  * hashCode stays cheap on purpose: constant arrays contribute only
  * their LENGTH (codebooks can be megabytes, and TreeNode hashes
  * expressions repeatedly during planning). That is consistent with
  * equals — content-equal instances have equal lengths and equal
  * non-array fields — it merely makes same-shape/different-content
  * instances collide, which equality then resolves.
  */
trait ArrayFieldEquality extends Product {

  private def eqDeep(x: Any, y: Any): Boolean = (x, y) match {
    case (a: Array[_], b: Array[_]) =>
      a.length == b.length && a.indices.forall(i => eqDeep(a(i), b(i)))
    case _ => x == y
  }

  override def equals(o: Any): Boolean = o match {
    case that: Product if that.getClass == this.getClass =>
      this.productArity == that.productArity &&
        (0 until productArity).forall(i => eqDeep(this.productElement(i), that.productElement(i)))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = getClass.hashCode()
    productIterator.foreach {
      case a: Array[_] => h = h * 31 + a.length
      case other       => h = h * 31 + (if (other == null) 0 else other.hashCode())
    }
    h
  }
}
