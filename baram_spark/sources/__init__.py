"""Sources & sinks: url extraction, table layout, incremental reads."""
