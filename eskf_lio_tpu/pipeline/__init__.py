"""The odometry orchestrator: host IO boundary + fused jitted device step."""
