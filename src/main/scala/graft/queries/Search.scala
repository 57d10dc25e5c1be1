package graft.queries
import graft.QueryDef
object Search { def defs: Seq[QueryDef] = Seq() }
