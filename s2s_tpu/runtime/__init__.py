"""Host-side runtime: threaded stage handlers + the device compute scheduler."""
