package graft

package object http {
  /** Spec-local name for the main-scope embedded server. */
  type TestHttpServer = graft.sources.http.testkit.EmbeddedJsonServer
}

package http {
  object Fixtures {
    /** The reference's 10-user mock payload shape
      * (ref: HttpLookupConnectorIntegrationTest.scala:57-69). */
    def usersJson(prefix: String = "Mock"): String =
      (1 to 10).map { i =>
        s"""{"id": $i, "name": "$prefix Name$i", "username": "$prefix User$i", "email": "user$i@example.com"}"""
      }.mkString("[", ",", "]")

    val usersSchema = "id INT, name STRING, username STRING, email STRING"
  }
}
