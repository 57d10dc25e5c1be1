package graft.queries
import graft.QueryDef
object Graph { def defs: Seq[QueryDef] = Seq() }
