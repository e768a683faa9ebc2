"""Engine operators: each module re-expresses one reference workload (or
north-star extension) as an idiomatic Spark DataFrame program."""
