package graft.aql

/** AQL IR — the analogue of the reference's `aql.JobScript`
  * (reference aql/parser.go:146-158): a bag of typed blocks with options.
  */
object Ast {

  /** Option values are strings, numbers, or booleans
    * (reference aql/parser.go:100-121 OptionValue).
    */
  sealed trait OptVal { def asString: String }
  final case class OptStr(s: String) extends OptVal { def asString: String = s }
  final case class OptNum(d: Double) extends OptVal {
    def asString: String =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
  }

  type Options = Map[String, OptVal] // keys uppercased (case-insensitive)

  /** Truthiness per reference aql/parser.go:357-377: number != 0, or
    * string in {true, 1, yes} case-insensitively.
    */
  def truthy(v: OptVal): Boolean = v match {
    case OptNum(d) => d != 0
    case OptStr(s) => Set("TRUE", "1", "YES")(s.trim.toUpperCase)
  }

  sealed trait SourceRef
  case object FromGlobal extends SourceRef
  final case class FromConnection(name: String) extends SourceRef
  final case class FromBlock(name: String) extends SourceRef

  sealed trait DestRef
  case object IntoGlobal extends DestRef
  case object IntoConsole extends DestRef
  final case class IntoConnection(name: String) extends DestRef
  final case class IntoParameter(params: Seq[String]) extends DestRef

  sealed trait Block { def name: String }

  final case class Include(file: String) extends Block {
    def name: String = s"include:$file"
  }
  final case class Declare(param: String) extends Block {
    def name: String = s"declare:$param"
  }
  final case class SetOpt(key: String, value: OptVal) extends Block {
    def name: String = s"set:$key"
  }
  final case class Connection(name: String, options: Options) extends Block

  final case class Query(
      name: String,
      extern: Option[String],
      source: SourceRef,
      content: String,
      usingParams: Seq[String],
      dests: Seq[DestRef],
      options: Options,
      after: Seq[String],
      execOnly: Boolean) extends Block

  final case class Data(
      name: String,
      extern: Option[String],
      content: String,
      dests: Seq[DestRef],
      options: Options,
      after: Seq[String]) extends Block

  final case class Global(name: String, content: String,
      options: Options) extends Block

  final case class Transform(
      name: String,
      plugin: Boolean,
      sources: Seq[SourceRef],
      content: String,
      dests: Seq[DestRef],
      options: Options,
      after: Seq[String]) extends Block

  final case class Test(target: String, assertions: String) extends Block {
    def name: String = s"test:$target"
  }

  final case class JobScript(blocks: Vector[Block]) {
    def connections: Map[String, Connection] =
      blocks.collect { case c: Connection => c.name.toUpperCase -> c }.toMap
    def globalOptions: Options =
      blocks.collect { case SetOpt(k, v) => k -> v }.toMap
  }
}
