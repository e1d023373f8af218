package graft

/** Typed SQL error contract: any statement that fails to parse, analyze,
  * or route carries the offending statement text — the parity point with
  * the reference's TrinoAggregateException wrapping of protocol errors
  * (reference tests/IntegrationTests/TrinoClientIntegrationTests.cs:126-132,
  * where invalid SQL surfaces as a typed exception, not a raw transport
  * failure).
  */
final class GraftQueryException(val statement: String, message: String,
                                cause: Throwable = null)
  extends RuntimeException(s"$message [statement: $statement]", cause)
